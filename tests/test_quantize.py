"""Weight-only int8 quantization (`models/quantize.py`): round-trip bounds, apply()
acceptance of the quantized layout, serving + bundle integration, size reduction."""
import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.models.quantize import (dequantize_params, quantization_error,
                                            quantize_params_int8)

ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")


@pytest.fixture(scope="module")
def config_and_params():
    import jax
    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    return config, w2l.init_params(config, jax.random.PRNGKey(0))


def test_round_trip_error_bounded_by_half_step(config_and_params):
    _, params = config_and_params
    qparams = quantize_params_int8(params)
    round_trip = dequantize_params(qparams)
    for layer, qlayer, back in zip(params, qparams, round_trip):
        assert qlayer["w_q"].dtype == np.int8
        # Symmetric rounding: per-channel error <= scale/2 (+ f32 division noise).
        err = np.abs(np.asarray(layer["w"], np.float32) - back["w"])
        bound = qlayer["w_scale"][None, None, :] / 2
        assert np.all(err <= bound * (1 + 1e-4))
        np.testing.assert_array_equal(np.asarray(layer["b"]), back["b"])
    assert quantization_error(params) < 0.01  # Glorot weights are small


def test_apply_accepts_quantized_params(config_and_params):
    config, params = config_and_params
    rng = np.random.RandomState(0)
    inputs = rng.randn(2, 64, 128).astype(np.float32)
    full = np.asarray(w2l.apply(config, params, inputs))
    quantized = np.asarray(w2l.apply(config, quantize_params_int8(params), inputs))
    assert quantized.shape == full.shape
    # Logit perturbation stays small relative to the logit scale.
    scale = np.maximum(np.abs(full).max(), 1.0)
    assert np.max(np.abs(full - quantized)) / scale < 0.05


def test_non_weight_layers_pass_through():
    layers = [{"w": np.ones((3, 4, 5), np.float32), "b": np.zeros(5, np.float32)},
              {"asg_transitions": np.ones((4, 4), np.float32)}]
    qparams = quantize_params_int8(layers)
    assert set(qparams[1]) == {"asg_transitions"}


def test_serving_and_bundle_quantized(config_and_params, tmp_path):
    from speechless_tpu.serving import Transcriber
    from speechless_tpu.serving_export import ExportedTranscriber, export_transcriber

    config, params = config_and_params
    full = Transcriber(config, params, ALPHABET, sample_buckets=(16384,))
    quantized = Transcriber(config, params, ALPHABET, sample_buckets=(16384,),
                            quantize_weights=True)
    audio = (np.random.RandomState(0).randn(9000) * 0.1).astype(np.float32)
    text_full, conf_full = full.transcribe_audio_with_confidence(audio)
    text_q, conf_q = quantized.transcribe_audio_with_confidence(audio)
    assert isinstance(text_q, str)
    assert conf_q == pytest.approx(conf_full, abs=0.02)

    bundle_full = export_transcriber(full, tmp_path / "full")
    bundle_q = export_transcriber(quantized, tmp_path / "q")
    import json
    assert json.loads((bundle_q / "manifest.json").read_text())["quantized"] is True
    size_full = (bundle_full / "weights-epoch0.npz").stat().st_size
    size_q = (bundle_q / "weights-epoch0.npz").stat().st_size
    assert size_q < size_full / 3.5  # int8 weights ~4x smaller than f32
    loaded = ExportedTranscriber(bundle_q)
    replay_text, replay_conf = loaded.transcribe_audio_with_confidence(audio)
    assert replay_text == text_q
    assert replay_conf == pytest.approx(conf_q, abs=1e-5)


def test_transcriber_pins_weights_on_device(config_and_params):
    """Quantized params arrive as numpy; the Transcriber must device_put them once or
    every request re-uploads the whole weight set (measured 605 ms/request of pure
    transfer on a tunneled TPU link)."""
    import jax

    from speechless_tpu.serving import Transcriber
    config, params = config_and_params
    transcriber = Transcriber(config, params, ALPHABET, sample_buckets=(16384,),
                              quantize_weights=True)
    leaves = jax.tree.leaves(transcriber.params)
    assert leaves and all(isinstance(leaf, jax.Array) for leaf in leaves)


def test_int8_mxu_compute_close_to_f32(config_and_params):
    """`int8_compute=True`: the wide convs run as int8 x int8 -> int32 MXU
    convolutions with dynamic per-tensor activation quant. Logit perturbation stays
    small relative to the logit scale, transcription still works, and the flag
    implies weight quantization."""
    from speechless_tpu.serving import Transcriber

    config, params = config_and_params
    full = Transcriber(config, params, ALPHABET, sample_buckets=(16384,))
    mxu = Transcriber(config, params, ALPHABET, sample_buckets=(16384,),
                      int8_compute=True)
    assert mxu.quantized and mxu.int8_compute and mxu.config.int8_compute
    audio = (np.random.RandomState(5).randn(12000) * 0.3).astype(np.float32)
    lp_full = full.frame_log_probs(audio)
    lp_mxu = mxu.frame_log_probs(audio)
    assert lp_full.shape == lp_mxu.shape
    # Frame decisions barely move: the two paths' argmaxes agree on almost
    # every frame (quantization noise can flip genuinely borderline frames).
    agree = float(np.mean(lp_full.argmax(-1) == lp_mxu.argmax(-1)))
    assert agree >= 0.95, agree
    assert isinstance(mxu.transcribe_audio(audio), str)


def test_int8_compute_leaves_trunk_dequantized(config_and_params):
    """Only the big convs take the int8 conv path — the narrow trunk dequantizes
    (its output must match the weight-only path bit-for-bit, which pins that the
    int8_compute flag cannot silently change trunk numerics)."""
    import dataclasses

    import jax.numpy as jnp

    from speechless_tpu.models.quantize import quantize_params_int8

    config, params = config_and_params
    qparams = quantize_params_int8(params)
    trunk_only = dataclasses.replace(
        config, int8_compute=True,
        layers=tuple(spec for spec in config.layers
                     if not spec.name.startswith("big_conv"))[:3])
    trunk_params = [qp for qp, spec in zip(qparams, config.layers)
                    if not spec.name.startswith("big_conv")][:3]
    baseline = dataclasses.replace(trunk_only, int8_compute=False)
    x = np.random.RandomState(1).randn(1, 64, 128).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(w2l.apply(trunk_only, trunk_params, jnp.asarray(x))),
        np.asarray(w2l.apply(baseline, trunk_params, jnp.asarray(x))))
