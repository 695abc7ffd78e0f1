"""Sequence parallelism (`parallel/sequence.py`): the time axis sharded over the mesh
with ICI halo exchange — output parity with the unsharded forward, including SAME
boundary behavior, stride alignment, and the raw-wave frontend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.parallel import mesh as pmesh
from speechless_tpu.parallel.sequence import (halo_output_frames,
                                              receptive_field_inputs,
                                              sequence_parallel_log_probs,
                                              sequence_parallel_logits)


def mel_like_config():
    layers = (
        w2l.ConvSpec("striding_conv", 16, 48, 2, "relu", False),
        w2l.ConvSpec("inner_conv_1", 16, 7, 1, "relu", False),
        w2l.ConvSpec("big_conv_1", 24, 32, 1, "relu", False),
        w2l.ConvSpec("big_conv_2", 24, 1, 1, "relu", False),
        w2l.ConvSpec("output_conv", 5, 1, 1, "linear", False),
    )
    return w2l.Wav2LetterConfig(input_size_per_time_step=8, grapheme_set_size=5,
                                layers=layers)


def test_receptive_field_and_halo():
    config = mel_like_config()
    # 1 <- k1 <- k1 <- k32: 32 <- k7: 38 <- k48/s2: (38-1)*2+48
    assert receptive_field_inputs(config) == 122
    assert halo_output_frames(config) == 61
    full = w2l.Wav2LetterConfig(input_size_per_time_step=128, grapheme_set_size=29)
    assert receptive_field_inputs(full) == (74 - 1) * 2 + 48


@pytest.mark.parametrize("frames", [2048, 2000])  # exact multiple + padded tail
def test_matches_unsharded_forward(frames):
    config = mel_like_config()
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, frames, 8), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])

    sharded = np.asarray(sequence_parallel_logits(config, params, x, mesh))
    direct = np.asarray(w2l.apply(config, params, x))
    valid = frames // config.input_to_prediction_length_ratio
    assert sharded.shape[1] >= direct.shape[1]
    np.testing.assert_allclose(sharded[:, :valid], direct[:, :valid],
                               rtol=1e-5, atol=1e-5)


def test_output_stays_time_sharded():
    config = mel_like_config()
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4096, 8), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    out = sequence_parallel_logits(config, params, x, mesh)
    # Each device holds only its own T/8 slice of the posteriors.
    assert {s.data.shape[1] for s in out.addressable_shards} == {out.shape[1] // 8}


def test_log_probs_normalized():
    config = mel_like_config()
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 8), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    lp = np.asarray(sequence_parallel_log_probs(config, params, x, mesh))
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)


def test_short_input_falls_back_unsharded():
    """chunk < halo (input too short to shard profitably): plain forward, same result."""
    config = mel_like_config()
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 8), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    out = np.asarray(sequence_parallel_logits(config, params, x, mesh))
    direct = np.asarray(w2l.apply(config, params, x))
    np.testing.assert_allclose(out[:, :direct.shape[1]], direct, rtol=1e-5, atol=1e-5)


def test_raw_wave_frontend_parity():
    """Stride-320 raw-wave frontend: halos are sample-scale, parity still holds."""
    layers = (
        w2l.ConvSpec("wave_conv", 8, 250, 160, "relu", False),
        w2l.ConvSpec("striding_conv", 8, 48, 2, "relu", False),
        w2l.ConvSpec("output_conv", 4, 1, 1, "linear", False),
    )
    config = w2l.Wav2LetterConfig(input_size_per_time_step=1, grapheme_set_size=4,
                                  use_raw_wave_input=True, layers=layers)
    assert config.input_to_prediction_length_ratio == 320
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    samples = 320 * 40 * 8  # chunk = 12800 samples >= halo
    x = jax.random.normal(jax.random.PRNGKey(2), (1, samples, 1), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    sharded = np.asarray(sequence_parallel_logits(config, params, x, mesh))
    direct = np.asarray(w2l.apply(config, params, x))
    np.testing.assert_allclose(sharded, direct, rtol=1e-5, atol=1e-5)


def test_greedy_decode_composes():
    """Posteriors from the SP forward feed the existing greedy decoder unchanged."""
    from speechless_tpu.ops.decode import greedy_decode

    config = mel_like_config()
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 8), jnp.float32)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    blank = config.grapheme_set_size - 1
    lp = sequence_parallel_log_probs(config, params, x, mesh)
    lengths = w2l.prediction_lengths(config, jnp.asarray([2048]))
    sp_tokens, sp_counts = greedy_decode(lp, lengths, blank)
    direct_lp = jax.nn.log_softmax(w2l.apply(config, params, x), axis=-1)
    ref_tokens, ref_counts = greedy_decode(direct_lp, lengths, blank)
    np.testing.assert_array_equal(np.asarray(sp_counts), np.asarray(ref_counts))
    t = ref_tokens.shape[1]
    np.testing.assert_array_equal(np.asarray(sp_tokens)[:, :t], np.asarray(ref_tokens))
