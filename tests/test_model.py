"""Model geometry/shape tests (what the reference lacked entirely, SURVEY.md §4c)."""
import jax
import jax.numpy as jnp
import numpy as np

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.text import english_frequent_characters, german_frequent_characters


def small_config(**kwargs):
    return w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                grapheme_set_size=len(english_frequent_characters) + 1,
                                **kwargs)


class TestArchitecture:
    def test_layer_geometry_mel(self):
        config = small_config()
        names = config.layer_names
        assert names[0] == "striding_conv"
        assert names[1:8] == ["inner_conv_{}".format(i) for i in range(1, 8)]
        assert names[8:] == ["big_conv_1", "big_conv_2", "output_conv"]
        assert len(names) == 11
        assert config.input_to_prediction_length_ratio == 2

    def test_layer_geometry_raw_wave(self):
        config = w2l.Wav2LetterConfig(input_size_per_time_step=1, grapheme_set_size=29,
                                      use_raw_wave_input=True)
        assert config.layer_names[0] == "wave_conv"
        assert len(config.layers) == 12
        assert config.input_to_prediction_length_ratio == 320

    def test_param_count(self):
        # ~23M params is the reference's architecture cost anchor (BASELINE.md).
        config = small_config()
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        total = sum(int(np.prod(p["w"].shape)) + int(np.prod(p["b"].shape)) for p in params)
        assert 20_000_000 < total < 26_000_000

    def test_forward_shapes_and_stride(self):
        config = small_config()
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        x = jnp.zeros((2, 100, 128))
        logits = w2l.apply(config, params, x)
        assert logits.shape == (2, 50, config.grapheme_set_size)
        assert logits.dtype == jnp.float32

    def test_probabilities_normalized(self):
        config = small_config()
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        probs = w2l.probabilities(config, params, jnp.ones((1, 20, 128)))
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    def test_dropout_requires_rng_and_changes_output(self):
        config = small_config(dropout=0.5)
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 20, 128), dtype=jnp.float32)
        import pytest
        with pytest.raises(ValueError):
            w2l.apply(config, params, x, train=True)
        a = w2l.apply(config, params, x, train=True, dropout_rng=jax.random.PRNGKey(1))
        b = w2l.apply(config, params, x, train=True, dropout_rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # Eval path is deterministic and ignores dropout.
        c = w2l.apply(config, params, x, train=False)
        d = w2l.apply(config, params, x, train=False)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


class TestRemat:
    """Gradient rematerialization must be a pure memory/compute trade: the training
    forward, the loss, and every gradient are unchanged (jax.checkpoint recomputes
    the same ops), including under dropout (the per-layer keys are pre-split
    identically in both modes)."""

    def _loss(self, config, params, x, rng=None):
        logits = w2l.apply(config, params, x, train=True, dropout_rng=rng)
        return jnp.sum(logits ** 2) / x.size

    def test_forward_and_grads_match_non_remat(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 40, 128), jnp.float32)
        params = w2l.init_params(small_config(), jax.random.PRNGKey(0))
        values = {}
        grads = {}
        for remat in (False, True):
            config = small_config(remat=remat)
            values[remat], grads[remat] = jax.value_and_grad(
                lambda p: self._loss(config, p, x))(params)
        np.testing.assert_allclose(float(values[True]), float(values[False]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(grads[True]),
                        jax.tree_util.tree_leaves(grads[False])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                       atol=1e-7)

    def test_dropout_stream_identical_across_modes(self):
        x = jnp.asarray(np.random.RandomState(1).randn(1, 30, 128), jnp.float32)
        rng = jax.random.PRNGKey(3)
        params = w2l.init_params(small_config(dropout=0.3), jax.random.PRNGKey(0))
        out = [w2l.apply(small_config(dropout=0.3, remat=remat), params, x,
                         train=True, dropout_rng=rng) for remat in (False, True)]
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                                   rtol=1e-6, atol=1e-7)

    def test_inference_path_ignores_remat(self):
        x = jnp.ones((1, 20, 128))
        params = w2l.init_params(small_config(), jax.random.PRNGKey(0))
        a = w2l.apply(small_config(), params, x)
        b = w2l.apply(small_config(remat=True), params, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTransferRemap:
    def test_remap_english_to_german(self):
        rng = np.random.RandomState(0)
        source = english_frequent_characters
        target = german_frequent_characters
        output = {"w": jnp.asarray(rng.randn(1, 2000, len(source) + 1), dtype=jnp.float32),
                  "b": jnp.asarray(rng.randn(len(source) + 1), dtype=jnp.float32)}
        remapped = w2l.remap_output_layer(output, source, target)
        assert remapped["w"].shape == (1, 2000, len(target) + 1)
        # Shared characters keep their filters (including index 0 = 'a': the reference
        # implementation zeroed source index 0 due to a falsy-check bug; we keep it).
        for i, c in enumerate(target):
            if c in source:
                np.testing.assert_array_equal(np.asarray(remapped["w"][:, :, i]),
                                              np.asarray(output["w"][:, :, source.index(c)]))
            else:
                assert np.all(np.asarray(remapped["w"][:, :, i]) == 0)
                assert np.asarray(remapped["b"][i]) == 0
        # blank -> blank
        np.testing.assert_array_equal(np.asarray(remapped["w"][:, :, -1]),
                                      np.asarray(output["w"][:, :, -1]))

    def test_remap_roundtrip_same_charset_is_identity(self):
        rng = np.random.RandomState(1)
        chars = english_frequent_characters
        output = {"w": jnp.asarray(rng.randn(1, 4, len(chars) + 1), dtype=jnp.float32),
                  "b": jnp.asarray(rng.randn(len(chars) + 1), dtype=jnp.float32)}
        remapped = w2l.remap_output_layer(output, chars, chars)
        np.testing.assert_array_equal(np.asarray(remapped["w"]), np.asarray(output["w"]))
        np.testing.assert_array_equal(np.asarray(remapped["b"]), np.asarray(output["b"]))

    def test_trainable_mask(self):
        config = small_config()
        mask = w2l.trainable_mask(config, frozen_layer_count=8)
        assert mask == [False] * 8 + [True] * 3
