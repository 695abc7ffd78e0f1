"""Reference-checkpoint migration: Keras HDF5 weight files load (and export) correctly.

The reference saves `nets/<run>/weights-epoch{n}.h5` via Keras ``save_weights``
(`/root/reference/speechless/net.py:558-572`). A migrating user arrives with those
files; `train/keras_import.py` + the `train/checkpoint.py` fallback must make them
drop-in loadable through every load path, and the export direction must produce files a
Keras loader would accept (layer names from `net.py:291-341`, kernel layout
``(kernel_size, in, filters)``).
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
h5py = pytest.importorskip("h5py")

import jax

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.train import checkpoint as ckpt
from speechless_tpu.train.keras_import import (is_keras_weight_file, load_keras_params,
                                               save_keras_params)


def tiny_config(grapheme_set_size: int = 5) -> w2l.Wav2LetterConfig:
    return w2l.Wav2LetterConfig(
        input_size_per_time_step=4, grapheme_set_size=grapheme_set_size,
        layers=(
            w2l.ConvSpec("striding_conv", 6, 5, 2, "relu", False),
            w2l.ConvSpec("inner_conv_1", 6, 3, 1, "relu", False),
            w2l.ConvSpec("output_conv", grapheme_set_size, 1, 1, "linear", False),
        ))


def assert_params_equal(got: w2l.Params, expected: w2l.Params) -> None:
    assert len(got) == len(expected)
    for got_layer, expected_layer in zip(got, expected):
        assert sorted(got_layer) == sorted(expected_layer)
        for key in expected_layer:
            np.testing.assert_array_equal(np.asarray(got_layer[key]),
                                          np.asarray(expected_layer[key]))


def write_keras2_file(path, layers, extra_weightless=(), nest_in_model_weights=False):
    """Hand-build a Keras-2 ``save_weights``-layout file: the format the reference's
    2017-era Keras wrote (root ``layer_names`` attr; per-layer ``weight_names`` of
    ``<layer>/kernel:0`` nested datasets; Dropout layers present but weight-less)."""
    with h5py.File(str(path), "w") as f:
        root = f.create_group("model_weights") if nest_in_model_weights else f
        # Interleave weight-less (Dropout) groups before their convs, as Keras does.
        ordered = []
        for name, kernel, bias in layers:
            if name in extra_weightless:
                ordered.append(("dropout_before_{}".format(name), None, None))
            ordered.append((name, kernel, bias))
        root.attrs["layer_names"] = np.array([n.encode() for n, _, _ in ordered])
        for name, kernel, bias in ordered:
            group = root.create_group(name)
            if kernel is None:
                group.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            weight_names = ["{}/kernel:0".format(name), "{}/bias:0".format(name)]
            group.attrs["weight_names"] = np.array([n.encode() for n in weight_names])
            group.create_dataset(weight_names[0], data=kernel)
            group.create_dataset(weight_names[1], data=bias)


def layers_for(config, seed=0):
    rng = np.random.RandomState(seed)
    layers = []
    in_channels = config.input_size_per_time_step
    for spec in config.layers:
        kernel = rng.randn(spec.kernel_size, in_channels, spec.filters).astype(np.float32)
        bias = rng.randn(spec.filters).astype(np.float32)
        layers.append((spec.name, kernel, bias))
        in_channels = spec.filters
    return layers


class TestLoadKerasParams:
    def test_loads_keras2_layout_values_and_order(self, tmp_path):
        config = tiny_config()
        layers = layers_for(config)
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, layers)
        params = load_keras_params(path, config)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])

    def test_skips_dropout_groups(self, tmp_path):
        config = tiny_config()
        layers = layers_for(config)
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, layers,
                          extra_weightless={"striding_conv", "inner_conv_1"})
        params = load_keras_params(path, config)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])

    def test_loads_model_weights_nested_layout(self, tmp_path):
        """Full ``model.save`` files nest weights under a ``model_weights`` group."""
        config = tiny_config()
        layers = layers_for(config)
        path = tmp_path / "model.h5"
        write_keras2_file(path, layers, nest_in_model_weights=True)
        params = load_keras_params(path, config)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])

    def test_loads_keras1_weight_naming(self, tmp_path):
        """Keras 1 named weights ``<layer>_W`` / ``<layer>_b`` (flat datasets)."""
        config = tiny_config()
        layers = layers_for(config)
        path = tmp_path / "weights-epoch1.h5"
        with h5py.File(str(path), "w") as f:
            f.attrs["layer_names"] = np.array([n.encode() for n, _, _ in layers])
            for name, kernel, bias in layers:
                group = f.create_group(name)
                weight_names = ["{}_W".format(name), "{}_b".format(name)]
                group.attrs["weight_names"] = np.array([n.encode() for n in weight_names])
                group.create_dataset(weight_names[0], data=kernel)
                group.create_dataset(weight_names[1], data=bias)
        params = load_keras_params(path, config)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])

    def test_charset_mismatch_fails_loudly(self, tmp_path):
        donor_layers = layers_for(tiny_config(grapheme_set_size=7))
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, donor_layers)
        with pytest.raises(ValueError, match="kernel shape"):
            load_keras_params(path, tiny_config(grapheme_set_size=5))

    def test_architecture_mismatch_fails_loudly(self, tmp_path):
        config = tiny_config()
        layers = layers_for(config)[:2]  # missing the output conv
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, layers)
        with pytest.raises(ValueError, match="do not match"):
            load_keras_params(path, config)


class TestRoundTrip:
    def test_save_then_load_is_identity(self, tmp_path):
        config = tiny_config()
        params = w2l.init_params(config, jax.random.PRNGKey(3))
        path = tmp_path / "weights-epoch2.h5"
        save_keras_params(path, config, params)
        assert_params_equal(load_keras_params(path, config), params)

    def test_exported_file_has_keras_structure(self, tmp_path):
        """The export must be byte-compatible with what a Keras loader expects."""
        config = tiny_config()
        params = w2l.init_params(config, jax.random.PRNGKey(3))
        path = tmp_path / "weights-epoch2.h5"
        save_keras_params(path, config, params)
        with h5py.File(str(path), "r") as f:
            names = [n.decode() for n in f.attrs["layer_names"]]
            assert names == ["striding_conv", "inner_conv_1", "output_conv"]
            group = f["striding_conv"]
            weight_names = [n.decode() for n in group.attrs["weight_names"]]
            assert weight_names == ["striding_conv/kernel:0", "striding_conv/bias:0"]
            kernel = np.asarray(group["striding_conv/kernel:0"])
            assert kernel.shape == (5, 4, 6)  # (kernel_size, in, filters)

    def test_quantized_params_are_rejected(self, tmp_path):
        config = tiny_config()
        params = w2l.init_params(config, jax.random.PRNGKey(3))
        params[0] = {"w_q": jnp.zeros((5, 4, 6), jnp.int8),
                     "w_scale": jnp.ones((6,)), "b": params[0]["b"]}
        with pytest.raises(ValueError, match="quantized"):
            save_keras_params(tmp_path / "q.h5", config, params)


class TestMissingLayerNamesAttr:
    """Files without the root ``layer_names`` attribute: h5py group iteration is
    alphabetical, which misorders even the reference geometry ('big_conv_1' sorts
    before 'striding_conv') — so order must come from the config, or loading fails."""

    @staticmethod
    def _strip_layer_names(path):
        with h5py.File(str(path), "a") as f:
            del f.attrs["layer_names"]

    def test_config_restores_model_order(self, tmp_path):
        config = tiny_config()
        layers = layers_for(config)
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, layers)
        self._strip_layer_names(path)
        params = load_keras_params(path, config)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])

    def test_without_config_fails_loudly(self, tmp_path):
        config = tiny_config()
        path = tmp_path / "weights-epoch1.h5"
        write_keras2_file(path, layers_for(config))
        self._strip_layer_names(path)
        with pytest.raises(ValueError, match="layer_names"):
            load_keras_params(path)


class TestCheckpointFallback:
    def test_fallback_with_config_validates_charset(self, tmp_path):
        """`load_params(config=...)` routes validation into the .h5 fallback, so a
        charset-mismatched reference checkpoint fails at load time instead of decoding
        garbage through a wrong blank index."""
        donor_layers = layers_for(tiny_config(grapheme_set_size=7))
        write_keras2_file(tmp_path / "weights-epoch3.h5", donor_layers)
        with pytest.raises(ValueError, match="kernel shape"):
            ckpt.load_params(tmp_path, 3, config=tiny_config(grapheme_set_size=5))

    def test_load_params_falls_back_to_h5(self, tmp_path):
        config = tiny_config()
        layers = layers_for(config)
        write_keras2_file(tmp_path / "weights-epoch3.h5", layers)
        params = ckpt.load_params(tmp_path, 3)
        assert_params_equal(params, [{"w": k, "b": b} for _, k, b in layers])
        # The reference never saved optimizer state or a step counter.
        assert ckpt.load_step(tmp_path, 3) is None
        assert ckpt.load_opt_state(tmp_path, 3, {"m": jnp.zeros(2)}) is None

    def test_npz_wins_over_h5_at_the_same_epoch(self, tmp_path):
        config = tiny_config()
        write_keras2_file(tmp_path / "weights-epoch3.h5", layers_for(config, seed=1))
        npz_params = w2l.init_params(config, jax.random.PRNGKey(4))
        ckpt.save_checkpoint(tmp_path, 3, npz_params)
        assert_params_equal(ckpt.load_params(tmp_path, 3), npz_params)

    def test_available_epochs_sees_h5_checkpoints(self, tmp_path):
        from speechless_tpu.experiments import available_epochs
        config = tiny_config()
        write_keras2_file(tmp_path / "weights-epoch2.h5", layers_for(config))
        write_keras2_file(tmp_path / "weights-epoch10.h5", layers_for(config))
        ckpt.save_checkpoint(tmp_path, 5, w2l.init_params(config, jax.random.PRNGKey(0)))
        assert available_epochs(tmp_path) == [2, 5, 10]

    def test_transfer_remap_from_h5_donor(self, tmp_path):
        """The cross-charset transfer path (`net.py:209-269` semantics) works straight
        off a reference checkpoint: shared characters keep their donor filters."""
        source_characters = ["a", "b", "c", "d"]   # + blank = 5 graphemes
        target_characters = ["a", "c", "x"]        # + blank = 4 graphemes
        donor_config = tiny_config(grapheme_set_size=len(source_characters) + 1)
        donor_layers = layers_for(donor_config, seed=2)
        write_keras2_file(tmp_path / "weights-epoch7.h5", donor_layers)

        target_config = tiny_config(grapheme_set_size=len(target_characters) + 1)
        params = ckpt.load_params_with_character_remap(
            tmp_path, 7, source_characters, target_characters, target_config)

        donor_output_kernel = donor_layers[-1][1]
        got_output_kernel = np.asarray(params[-1]["w"])
        np.testing.assert_array_equal(got_output_kernel[..., 0],
                                      donor_output_kernel[..., 0])  # 'a'
        np.testing.assert_array_equal(got_output_kernel[..., 1],
                                      donor_output_kernel[..., 2])  # 'c'
        np.testing.assert_array_equal(got_output_kernel[..., 2], 0.0)  # 'x': fresh zeros
        np.testing.assert_array_equal(got_output_kernel[..., 3],
                                      donor_output_kernel[..., 4])  # blank -> blank
        # Earlier layers copy through unchanged.
        np.testing.assert_array_equal(np.asarray(params[0]["w"]), donor_layers[0][1])


class TestConvertCli:
    def test_h5_to_npz_and_back(self, tmp_path):
        from speechless_tpu.__main__ import main
        # Full reference geometry (the npz->h5 direction infers the architecture from
        # the weight shapes, which only works for the real 11/12-layer wav2letter).
        config = w2l.Wav2LetterConfig(input_size_per_time_step=8, grapheme_set_size=5)
        params = w2l.init_params(config, jax.random.PRNGKey(9))
        h5_path = tmp_path / "weights-epoch1.h5"
        save_keras_params(h5_path, config, params)

        npz_path = tmp_path / "weights-epoch1.npz"
        main(["convert", str(h5_path), str(npz_path)])
        assert_params_equal(ckpt.load_params_npz(npz_path), params)

        back_path = tmp_path / "back.h5"
        main(["convert", str(npz_path), str(back_path)])
        assert_params_equal(load_keras_params(back_path, config), params)

    def test_mismatched_extensions_rejected(self, tmp_path):
        from speechless_tpu.__main__ import main
        with pytest.raises(SystemExit, match="convert needs"):
            main(["convert", str(tmp_path / "a.txt"), str(tmp_path / "b.npz")])

    def test_is_keras_weight_file(self):
        assert is_keras_weight_file("weights-epoch3.h5")
        assert is_keras_weight_file("model.HDF5")
        assert not is_keras_weight_file("weights-epoch3.npz")
