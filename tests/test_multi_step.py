"""Device-side multi-step training (`trainer.make_multi_step` + `batching.stack_batches`):
k scanned optimizer updates per dispatch must match k sequential single steps exactly."""
import numpy as np
import jax.numpy as jnp
import jax
import pytest

from conftest import FakeSpectrogram

from speechless_tpu.data.batching import chunked, stack_batches
from speechless_tpu.train import (Batch, init_train_state, make_multi_step, make_optimizer,
                                  make_train_step)

from test_train import synthetic_batch, tiny_config


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_stack_batches_pads_to_group_max(rng):
    config = tiny_config()
    a = synthetic_batch(rng, config, batch=2, t=40, u=5)
    b = synthetic_batch(rng, config, batch=2, t=24, u=3)
    stacked = stack_batches([a, b])
    assert stacked.inputs.shape == (2, 2, 40, 8)
    assert stacked.labels.shape == (2, 2, 5)
    # Padding regions: zeros for features, -1 for labels; originals preserved.
    assert np.array_equal(stacked.inputs[0], np.asarray(a.inputs))
    assert np.array_equal(stacked.inputs[1][:, :24], np.asarray(b.inputs))
    assert np.all(stacked.inputs[1][:, 24:] == 0.0)
    assert np.array_equal(stacked.labels[1][:, :3], np.asarray(b.labels))
    assert np.all(stacked.labels[1][:, 3:] == -1)
    assert np.array_equal(stacked.input_lengths[1], np.asarray(b.input_lengths))


def test_chunked_groups_and_drops_remainder():
    assert list(chunked(iter(range(7)), 3)) == [[0, 1, 2], [3, 4, 5]]
    assert list(chunked(iter([]), 2)) == []


def test_multi_step_matches_sequential_single_steps(rng):
    config = tiny_config()
    optimizer = make_optimizer(1e-3)
    batches = [synthetic_batch(rng, config, batch=2, t=40, u=5) for _ in range(3)]

    single = make_train_step(config, optimizer, donate=False)
    state_seq = init_train_state(config, optimizer, jax.random.PRNGKey(7))
    losses_seq = []
    for batch in batches:
        state_seq, metrics = single(state_seq, batch)
        losses_seq.append(float(metrics["loss"]))

    multi = make_multi_step(config, optimizer, donate=False)
    state_multi = init_train_state(config, optimizer, jax.random.PRNGKey(7))
    stacked = Batch(*map(jnp.asarray, stack_batches(batches)))
    state_multi, metrics = multi(state_multi, stacked)

    np.testing.assert_allclose(np.asarray(metrics["step_losses"]), losses_seq, rtol=1e-5)
    assert int(state_multi.step) == int(state_seq.step) == 3
    for p_multi, p_seq in zip(jax.tree.leaves(state_multi.params),
                              jax.tree.leaves(state_seq.params)):
        np.testing.assert_allclose(np.asarray(p_multi), np.asarray(p_seq),
                                   rtol=1e-5, atol=1e-7)


def test_system_train_with_multi_step(tmp_path, rng):
    """E2E through the facade: system.train(multi_step=2) runs, checkpoints, and reduces
    the loss on an overfittable corpus."""
    import csv

    from speechless_tpu.system import Wav2Letter


    config = tiny_config()
    batch = synthetic_batch(rng, config, batch=4, t=40, u=5)
    specs = [FakeSpectrogram(np.asarray(batch.inputs[i]), "ab")
             for i in range(4)]

    w = Wav2Letter(input_size_per_time_step=8, allowed_characters=list("abcd"),
                   learning_rate=1e-3)
    w.config = config  # narrow test model
    w.state = init_train_state(config, w.optimizer, jax.random.PRNGKey(0))
    w._eval_step = None  # rebuilt lazily if used

    def batches():
        while True:
            yield specs

    from speechless_tpu.train.trainer import make_eval_step
    w._eval_step = make_eval_step(config)
    w.train(batches(), preview_labeled_spectrogram_batch=specs,
            tensor_board_log_directory=tmp_path / "logs",
            net_directory=tmp_path / "nets",
            batches_per_epoch=4, epoch_limit=2, multi_step=2, callback_step=10)
    assert (tmp_path / "nets" / "weights-epoch2.npz").exists()
    with (tmp_path / "logs" / "scalars.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[1]["loss"]) < float(rows[0]["loss"]) * 1.5  # training proceeds
    # 4 batches/epoch x 4 utterances tracked despite 2-step stacking
    assert int(rows[0]["step"]) == 4


def test_multi_step_must_divide_batches_per_epoch():
    from speechless_tpu.system import Wav2Letter

    w = Wav2Letter(input_size_per_time_step=8, allowed_characters=list("ab"))
    with pytest.raises(ValueError):
        w.train([], preview_labeled_spectrogram_batch=[],
                tensor_board_log_directory="/tmp/x", net_directory="/tmp/y",
                batches_per_epoch=10, multi_step=3)


class TestDurationBucketedSampling:
    """`bucket_training_batches`: like-length batches, uniform marginal distribution."""

    class FakeCached:
        def __init__(self, duration):
            self.label = "x"
            self.original = type("O", (), {"duration_in_s": duration})()

    def _generator(self, durations, batch_size=4):
        from speechless_tpu.data.batching import LabeledSpectrogramBatchGenerator

        generator = LabeledSpectrogramBatchGenerator.__new__(
            LabeledSpectrogramBatchGenerator)
        generator.batch_size = batch_size
        generator.bucket_training_batches = True
        generator.labeled_training_spectrograms = [self.FakeCached(d) for d in durations]
        return generator

    def test_batches_are_duration_homogeneous(self):
        import random

        random.seed(0)
        durations = [float(d) for d in range(2, 98)]  # 96 examples, 2..97 s
        generator = self._generator(durations, batch_size=4)
        buckets = generator._duration_buckets()
        assert len(buckets) == 8
        spans = []
        for batch in (next(iter([b])) for b in
                      [next(generator.training_batches()) for _ in range(50)]):
            ds = [s.original.duration_in_s for s in batch]
            spans.append(max(ds) - min(ds))
        # Bucket width is ~12 s; uniform sampling over 95 s would average ~4x that.
        assert np.mean(spans) < 15.0

    def test_marginal_distribution_stays_uniform(self):
        import random
        from collections import Counter

        random.seed(1)
        durations = [float(d % 13) + 1 for d in range(64)]
        generator = self._generator(durations, batch_size=4)
        counts = Counter()
        source = generator.training_batches()
        draws = 4000
        for _ in range(draws):
            for s in next(source):
                counts[id(s)] += 1
        expected = draws * 4 / 64
        observed = np.array([counts.get(id(s), 0)
                             for s in generator.labeled_training_spectrograms])
        # Every example drawn with the same marginal probability (within sampling noise).
        assert observed.min() > expected * 0.7 and observed.max() < expected * 1.3
