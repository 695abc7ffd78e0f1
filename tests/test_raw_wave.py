"""Raw-waveform frontend tests (`use_raw_wave_input`: wave conv k=250 s=160, stride ratio
320 — reference `net.py:309-316,343-348`)."""
import jax
import jax.numpy as jnp
import numpy as np

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
