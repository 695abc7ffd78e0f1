"""SpecAugment (ops/specaugment.py): mask semantics + facade wiring.

Beyond-reference feature (the reference's only regularizer is dropout,
`net.py:300-305`); masks must respect utterance lengths and never leak into eval."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechless_tpu.ops.specaugment import SpecAugment, apply_spec_augment


def _batch(batch=4, time=200, mel=128, seed=0):
    rng = np.random.RandomState(seed)
    inputs = rng.randn(batch, time, mel).astype(np.float32)
    lengths = np.array([200, 150, 90, 40], dtype=np.int32)[:batch]
    for i, n in enumerate(lengths):  # bucketed batches are zero-padded past the length
        inputs[i, n:] = 0.0
    return jnp.asarray(inputs), jnp.asarray(lengths)


class TestApplySpecAugment:
    def test_masks_are_zero_and_bounded(self):
        inputs, lengths = _batch()
        config = SpecAugment(frequency_mask_width=20, frequency_mask_count=2,
                             time_mask_fraction=0.1, time_mask_count=2)
        out = np.asarray(apply_spec_augment(jax.random.PRNGKey(0), inputs, lengths, config))
        assert out.shape == inputs.shape
        changed = out != np.asarray(inputs)
        # Everything changed was set to zero (mean-masking after z-norm).
        assert np.all(out[changed] == 0.0)
        # Some masking actually happened somewhere in the batch.
        assert changed.any()
        for i, n in enumerate(np.asarray(lengths)):
            # Upper bound: 2 freq masks of <=20 bins + 2 time masks of <=10% of length.
            max_zeroed = (2 * 20 * n + 2 * int(0.1 * n) * 128)
            assert changed[i].sum() <= max_zeroed

    def test_time_masks_respect_utterance_length(self):
        inputs, lengths = _batch()
        config = SpecAugment(frequency_mask_count=0, time_mask_fraction=0.5,
                             time_mask_count=3)
        for seed in range(10):
            out = np.asarray(apply_spec_augment(jax.random.PRNGKey(seed), inputs,
                                                lengths, config))
            for i, n in enumerate(np.asarray(lengths)):
                # Padding frames (already zero) stay zero; masks start inside [0, n).
                assert np.array_equal(out[i, n:], np.zeros_like(out[i, n:]))
                # The mask never begins beyond the utterance: frames in [0, n) carry
                # all the zeroed columns.
                changed_rows = np.any(out[i] != np.asarray(inputs)[i], axis=1)
                assert not changed_rows[n:].any()

    def test_deterministic_in_rng(self):
        inputs, lengths = _batch()
        a = apply_spec_augment(jax.random.PRNGKey(7), inputs, lengths, SpecAugment())
        b = apply_spec_augment(jax.random.PRNGKey(7), inputs, lengths, SpecAugment())
        c = apply_spec_augment(jax.random.PRNGKey(8), inputs, lengths, SpecAugment())
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_jit_and_scan_compatible(self):
        inputs, lengths = _batch()
        config = SpecAugment()

        @jax.jit
        def scanned(rng, x):
            def body(carry, step_rng):
                return carry, apply_spec_augment(step_rng, x, lengths, config)
            _, outs = jax.lax.scan(body, 0, jax.random.split(rng, 3))
            return outs

        outs = np.asarray(scanned(jax.random.PRNGKey(0), inputs))
        assert outs.shape == (3,) + inputs.shape
        # Per-step rngs differ -> different masks per scanned step.
        assert not np.array_equal(outs[0], outs[1])

    def test_zero_counts_is_identity(self):
        inputs, lengths = _batch()
        config = SpecAugment(frequency_mask_count=0, time_mask_count=0)
        out = apply_spec_augment(jax.random.PRNGKey(0), inputs, lengths, config)
        assert np.array_equal(np.asarray(out), np.asarray(inputs))


class TestFacadeWiring:
    def test_train_step_applies_augmentation(self):
        # Same params + same batch: the augmented step must see different inputs, so
        # its loss differs from the unaugmented step's; eval is untouched either way.
        from speechless_tpu.system import Wav2Letter
        from speechless_tpu.text.charsets import english_frequent_characters

        def one_step(spec_augment):
            w = Wav2Letter(8, allowed_characters=english_frequent_characters,
                           spec_augment=spec_augment, seed=0)
            from speechless_tpu.train.trainer import Batch, make_train_step
            step = make_train_step(w.config, w.optimizer, donate=False,
                                   criterion=w._criterion,
                                   spec_augment=w.spec_augment)
            rng = np.random.RandomState(0)
            batch = Batch(inputs=jnp.asarray(rng.randn(2, 40, 8), jnp.float32),
                          input_lengths=jnp.array([40, 30], jnp.int32),
                          labels=jnp.array([[0, 1, 2, -1], [3, 4, -1, -1]], jnp.int32),
                          label_lengths=jnp.array([3, 2], jnp.int32))
            _, metrics = step(w.state, batch)
            return float(metrics["loss"])

        assert one_step(True) != pytest.approx(one_step(None))

    def test_spec_augment_true_selects_default_policy(self):
        from speechless_tpu.system import Wav2Letter
        from speechless_tpu.text.charsets import english_frequent_characters
        w = Wav2Letter(128, allowed_characters=english_frequent_characters,
                       spec_augment=True)
        assert isinstance(w.spec_augment, SpecAugment)
        assert Wav2Letter(128, allowed_characters=english_frequent_characters
                          ).spec_augment is None
