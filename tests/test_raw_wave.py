"""Raw-waveform frontend tests (`use_raw_wave_input`: wave conv k=250 s=160, stride ratio
320 — reference `net.py:309-316,343-348`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l


class TestRawWaveModel:
    def test_forward_shape_and_stride(self):
        # Thin variant of the raw-wave topology for CPU speed: same kernel/stride geometry.
        layers = (
            w2l.ConvSpec("wave_conv", 8, 250, 160, "relu", False),
            w2l.ConvSpec("striding_conv", 8, 48, 2, "relu", False),
            w2l.ConvSpec("output_conv", 5, 1, 1, "linear", False),
        )
        config = w2l.Wav2LetterConfig(input_size_per_time_step=1, grapheme_set_size=5,
                                      use_raw_wave_input=True, layers=layers)
        assert config.input_to_prediction_length_ratio == 320
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        samples = 3200
        x = jnp.asarray(np.random.RandomState(0).randn(2, samples, 1), dtype=jnp.float32)
        logits = w2l.apply(config, params, x)
        assert logits.shape == (2, samples // 320, 5)
        lengths = w2l.prediction_lengths(config, jnp.asarray([3200, 1600]))
        assert list(np.asarray(lengths)) == [10, 5]

    def test_full_raw_wave_geometry(self):
        config = w2l.Wav2LetterConfig(input_size_per_time_step=1, grapheme_set_size=29,
                                      use_raw_wave_input=True)
        assert config.layer_names[0] == "wave_conv"
        assert config.layers[0].kernel_size == 250
        assert config.layers[0].stride == 160
        assert config.input_to_prediction_length_ratio == 320


class TestRawWaveDataPath:
    """The reference declares the wave-conv frontend but its batch assembly always feeds
    spectrograms (`net.py:593`) — the raw path never ran there. Here it trains E2E."""

    def test_batch_from_raw_waves_shapes_and_buckets(self):
        from speechless_tpu.data.batching import (RAW_WAVE_SAMPLE_BUCKETS,
                                                  batch_from_spectrograms)
        from speechless_tpu.features.example import LabeledExample
        from speechless_tpu.text.graphemes import CtcGraphemeCodec

        rng = np.random.RandomState(0)
        examples = [LabeledExample(get_raw_audio=lambda n=n: rng.randn(n).astype(np.float32),
                                   id="u{}".format(n), label="hi there")
                    for n in (9000, 16000)]
        codec = CtcGraphemeCodec(list(" 'abcdefghijklmnopqrstuvwxyz"))
        batch, labels = batch_from_spectrograms(examples, codec, raw_wave=True)
        assert batch.inputs.shape == (2, RAW_WAVE_SAMPLE_BUCKETS[0], 1)  # 16384 samples
        assert list(batch.input_lengths) == [9000, 16000]
        assert labels == ["hi there", "hi there"]
        # z-normalization holds per utterance over the REAL samples.
        assert abs(float(batch.inputs[0, :9000, 0].mean())) < 1e-4
        assert float(batch.inputs[0, :9000, 0].std()) == pytest.approx(1.0, abs=1e-3)

    def test_raw_wave_train_step_learns(self):
        """Overfit a tiny raw-wave model through the real raw-wave batch assembly."""
        from speechless_tpu.data.batching import batch_from_spectrograms
        from speechless_tpu.features.example import LabeledExample
        from speechless_tpu.text.graphemes import CtcGraphemeCodec
        from speechless_tpu.train import (init_train_state, make_optimizer,
                                          make_train_step)

        chars = list(" ab")
        codec = CtcGraphemeCodec(chars)
        layers = (
            w2l.ConvSpec("wave_conv", 8, 250, 160, "relu", False),
            w2l.ConvSpec("striding_conv", 8, 48, 2, "relu", False),
            w2l.ConvSpec("output_conv", codec.grapheme_set_size, 1, 1, "linear", False),
        )
        config = w2l.Wav2LetterConfig(input_size_per_time_step=1,
                                      grapheme_set_size=codec.grapheme_set_size,
                                      use_raw_wave_input=True, layers=layers)
        rng = np.random.RandomState(0)

        def tone_example(label, freq, n=12800):
            t = np.arange(n) / 16000.0
            wave = np.sin(2 * np.pi * freq * t).astype(np.float32) \
                + 0.01 * rng.randn(n).astype(np.float32)
            return LabeledExample(get_raw_audio=lambda w=wave: w,
                                  id="{}-{}".format(label, freq), label=label)

        examples = [tone_example("a", 440.0), tone_example("b", 1320.0)]
        batch, _ = batch_from_spectrograms(examples, codec, raw_wave=True,
                                           time_buckets=(12800,))
        optimizer = make_optimizer(3e-3)
        state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(config, optimizer, donate=False)
        losses = []
        for _ in range(120):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.2, losses[::24]

    def test_facade_guards(self, tmp_path):
        from speechless_tpu.system import Wav2Letter

        with pytest.raises(ValueError, match="must be 1"):
            Wav2Letter(128, list(" ab"), use_raw_wave_input=True)

    def test_facade_raw_wave_train_and_predict(self, tmp_path):
        """Full Configuration workflow on raw waves: train 1 epoch through the real
        pipeline (cache/bucketing/preview), checkpoint, and predict."""
        from test_corpus import make_librispeech_tree

        from speechless_tpu.configuration import Configuration, DataDirectories
        from speechless_tpu.data import LibriSpeechCorpus, TrainingTestSplit
        from speechless_tpu.system import Wav2Letter

        corpus_root = tmp_path / "data" / "corpus" / "English"
        make_librispeech_tree(corpus_root / "mini", ["hey there", "what's up", "yes"])
        config = Configuration(
            name="English",
            corpus_from_directory=lambda d: LibriSpeechCorpus(
                base_directory=d, corpus_name="mini",
                training_test_split=TrainingTestSplit.overfit(2)),
            directories=DataDirectories(tmp_path / "data"),
            batch_size=2, training_batches_per_epoch=2)
        wav2letter = Wav2Letter(1, config.allowed_characters, use_raw_wave_input=True)
        config.train(wav2letter, run_name="rawrun", epoch_limit=1)
        assert (tmp_path / "data" / "nets" / "rawrun" / "weights-epoch1.npz").exists()
        prediction = wav2letter.predict(config.corpus.examples[0])
        assert isinstance(prediction, str)

    def test_spec_augment_rejected(self):
        # SpecAugment masks mel bins; a frequency mask over the (samples, 1) waveform's
        # size-1 trailing axis would zero the whole signal.
        from speechless_tpu.system import Wav2Letter

        with pytest.raises(ValueError, match="mel-feature"):
            Wav2Letter(1, list(" ab"), use_raw_wave_input=True, spec_augment=True)


class FakeWave:
    """Minimal LabeledSpectrogram stand-in for the raw-wave family."""

    def __init__(self, wave, label):
        self._wave = wave.astype(np.float32)
        self.label = label

    def z_normalized_raw_wave(self):
        wave = self._wave - self._wave.mean()
        std = wave.std()
        return (wave / (std if std > 0 else 1.0)).reshape(-1, 1)


class TestDeviceResidentRawWave:
    """Raw waveforms packed into HBM: the device-resident epoch program applies to the
    raw-wave family unchanged (waves are ~2.5 KB/s at f16 — far smaller than the mel
    residency budget)."""

    def _waves(self, count=6):
        rng = np.random.RandomState(0)
        labels = ["ab", "ba", "a", "b", "ab", "ba"]
        return [FakeWave(rng.randn(int(rng.randint(3000, 5000))), labels[i % len(labels)])
                for i in range(count)]

    def test_pack_matches_host_raw_batch(self):
        from speechless_tpu.data.batching import batch_from_spectrograms
        from speechless_tpu.data.device_dataset import build_device_dataset
        from speechless_tpu.text.graphemes import CtcGraphemeCodec

        codec = CtcGraphemeCodec(list(" ab"))
        examples = self._waves()
        dataset, megabytes = build_device_dataset(examples, codec, raw_wave=True)
        host, _ = batch_from_spectrograms(examples, codec, raw_wave=True)
        assert dataset.inputs.shape[1:] == host.inputs.shape[1:]  # same sample bucket
        for i in range(len(examples)):
            n = int(host.input_lengths[i])
            np.testing.assert_allclose(np.asarray(dataset.inputs[i, :n]),
                                       host.inputs[i, :n], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(dataset.input_lengths),
                                      host.input_lengths)
        assert megabytes > 0

    def test_facade_trains_device_resident(self, tmp_path):
        """E2E through the facade: HBM-packed waveforms, one dispatch per epoch,
        checkpoints written."""
        from speechless_tpu.system import Wav2Letter
        from speechless_tpu.train import init_train_state
        from speechless_tpu.train.trainer import make_eval_step

        import jax

        codec_chars = list(" ab")
        layers = (
            w2l.ConvSpec("wave_conv", 8, 250, 160, "relu", False),
            w2l.ConvSpec("striding_conv", 8, 48, 2, "relu", False),
            w2l.ConvSpec("output_conv", 4, 1, 1, "linear", False),
        )
        config = w2l.Wav2LetterConfig(input_size_per_time_step=1, grapheme_set_size=4,
                                      use_raw_wave_input=True, layers=layers)
        w = Wav2Letter(1, codec_chars, use_raw_wave_input=True, learning_rate=1e-3)
        w.config = config  # thin test model, same geometry contract
        w.state = init_train_state(config, w.optimizer, jax.random.PRNGKey(0))
        w._eval_step = make_eval_step(config)
        specs = self._waves()
        w.train([], preview_labeled_spectrogram_batch=specs[:2],
                tensor_board_log_directory=tmp_path / "logs",
                net_directory=tmp_path / "nets",
                batches_per_epoch=2, epoch_limit=1, callback_step=10,
                device_resident_examples=specs, batch_size=4)
        assert (tmp_path / "nets" / "weights-epoch1.npz").exists()
