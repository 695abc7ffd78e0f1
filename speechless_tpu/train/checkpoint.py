"""Checkpointing: per-epoch weight files with optional optimizer state, plus the
cross-charset transfer-learning load path.

File naming keeps the reference's convention ``weights-epoch{n}`` (`net.py:558-560`) with an
``.npz`` container instead of HDF5. Unlike the reference — which silently resets Adam moments
on resume (SURVEY.md §5) — optimizer state is saved alongside the weights and restored when
resuming, while transfer loads intentionally take weights only.
"""
import os
from pathlib import Path
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wav2letter as w2l
from ..utils.tools import log, mkdir


def model_file_name(epoch: int) -> str:
    return "weights-epoch{}.npz".format(epoch)


def keras_model_file_name(epoch: int) -> str:
    """The reference's own checkpoint naming (`net.py:558-560`)."""
    return "weights-epoch{}.h5".format(epoch)


def _keras_fallback_path(directory: Path, epoch: int) -> Optional[Path]:
    """When no ``.npz`` checkpoint exists but the reference's ``.h5`` does, return it —
    this makes a reference user's existing ``nets/<run>/`` directories drop-in loadable
    (weights only; the reference never saved optimizer state, SURVEY.md §5)."""
    if (Path(directory) / model_file_name(epoch)).exists():
        return None
    h5_path = Path(directory) / keras_model_file_name(epoch)
    return h5_path if h5_path.exists() else None


def save_checkpoint(directory: Path, epoch: int, params: w2l.Params,
                    opt_state: Any = None, step: Optional[int] = None) -> Path:
    """Write params (plus flattened optimizer state and the global step counter) to
    ``directory/weights-epoch{n}.npz``. The write is atomic (temp file + rename) so a crash
    mid-save never leaves a truncated checkpoint for ``train_or_resume`` to trip on."""
    directory = Path(directory)
    mkdir(directory)
    arrays = _flatten_params(params)
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            arrays["opt.{}".format(i)] = np.asarray(leaf)
    if step is not None:
        arrays["step"] = np.asarray(int(step))
    path = directory / model_file_name(epoch)
    _write_npz_atomically(path, arrays)
    return path


def _write_npz_atomically(path: Path, arrays: dict) -> None:
    temp_path = path.with_name(path.name + ".tmp")
    with temp_path.open("wb") as f:  # file object: np.savez won't append a suffix
        np.savez(f, **arrays)
    os.replace(str(temp_path), str(path))


def _flatten_params(params: w2l.Params) -> dict:
    """The ``layer{i}.{key}`` flat naming shared by every ``.npz`` writer — one scheme,
    one reader (`load_params_npz`)."""
    return {"layer{}.{}".format(i, key): np.asarray(value)
            for i, layer in enumerate(params) for key, value in layer.items()}


def save_params_npz(path: Path, params: w2l.Params) -> Path:
    """Write a weights-only ``.npz`` at an arbitrary path (the CLI ``convert`` target)."""
    _write_npz_atomically(Path(path), _flatten_params(params))
    return Path(path)


def load_params_npz(path: Path) -> w2l.Params:
    """Load a parameter pytree from an ``.npz`` file at an arbitrary path."""
    with np.load(str(path)) as data:
        layer_keys: dict = {}
        for name in data.files:
            if not name.startswith("layer"):
                continue
            index_part, key = name.split(".", 1)
            layer_keys.setdefault(int(index_part[len("layer"):]), []).append(key)
        return [{key: jnp.asarray(data["layer{}.{}".format(i, key)])
                 for key in sorted(layer_keys[i])} for i in sorted(layer_keys)]


def load_params(directory: Path, epoch: int,
                config: Optional[w2l.Wav2LetterConfig] = None) -> w2l.Params:
    """Load the parameter pytree from a checkpoint file.

    Each layer restores whatever keys it was saved with: conv layers carry ``w``/``b``;
    a trainable-ASG run appends a criterion pseudo-layer with ``asg_transitions``/
    ``asg_initials`` (see `system.Wav2Letter(train_asg_transitions=True)`).

    Reference-format Keras checkpoints (``weights-epoch{n}.h5``) load transparently when
    no ``.npz`` is present, so migrated users keep their trained models. Pass ``config``
    when you have one: a charset- or geometry-mismatched ``.h5`` then fails loudly at
    load time instead of decoding garbage through a wrong blank index."""
    keras_path = _keras_fallback_path(directory, epoch)
    if keras_path is not None:
        from .keras_import import load_keras_params
        log("Loading reference-format Keras checkpoint {}".format(keras_path))
        return load_keras_params(keras_path, config=config)
    return load_params_npz(Path(directory) / model_file_name(epoch))


def load_step(directory: Path, epoch: int) -> Optional[int]:
    """Restore the global step counter saved alongside the weights (None if absent)."""
    if _keras_fallback_path(directory, epoch) is not None:
        return None  # the reference's .h5 files carry weights only
    path = Path(directory) / model_file_name(epoch)
    with np.load(str(path)) as data:
        return int(data["step"]) if "step" in data.files else None


def load_opt_state(directory: Path, epoch: int, opt_state_template: Any) -> Optional[Any]:
    """Restore optimizer state by re-leafing a template structure; None if not present."""
    if _keras_fallback_path(directory, epoch) is not None:
        return None  # the reference's .h5 files carry weights only
    path = Path(directory) / model_file_name(epoch)
    with np.load(str(path)) as data:
        opt_keys = sorted((k for k in data.files if k.startswith("opt.")),
                          key=lambda k: int(k.split(".")[1]))
        if not opt_keys:
            return None
        leaves = [jnp.asarray(data[k]) for k in opt_keys]
    treedef = jax.tree_util.tree_structure(opt_state_template)
    if treedef.num_leaves != len(leaves):
        log("Checkpoint optimizer state has {} leaves, expected {}; ignoring it.".format(
            len(leaves), treedef.num_leaves))
        return None
    return jax.tree_util.tree_unflatten(treedef, leaves)


def average_checkpoint_params(directory: Path, epochs: List[int],
                              config: Optional[w2l.Wav2LetterConfig] = None) -> w2l.Params:
    """Uniformly average the parameters of several epoch checkpoints of one run.

    Checkpoint averaging is the standard production-ASR smoothing step (wav2letter++ and
    every ESPnet recipe average the last N epochs before decoding); the reference has no
    equivalent — it always decodes the single last checkpoint (`net.py:558-572`). All
    checkpoints must share one structure (same layers, same keys — including a trained-ASG
    pseudo-layer, whose log-score tables average like any other leaf). Returns weights
    only; optimizer state is meaningless for an averaged model.
    """
    if not epochs:
        raise ValueError("need at least one epoch to average")
    accumulated: Optional[List[dict]] = None
    for epoch in epochs:
        params = load_params(directory, epoch, config=config)
        if accumulated is None:
            accumulated = [{key: np.asarray(value, np.float64) for key, value in layer.items()}
                           for layer in params]
            continue
        if len(params) != len(accumulated) or any(
                sorted(layer) != sorted(acc) for layer, acc in zip(params, accumulated)):
            raise ValueError(
                "checkpoint structure of epoch {} does not match epoch {} — checkpoints "
                "of different runs (or with/without trained ASG tables) cannot be "
                "averaged".format(epoch, epochs[0]))
        for acc, layer in zip(accumulated, params):
            for key, value in layer.items():
                value = np.asarray(value)
                if value.shape != acc[key].shape:
                    raise ValueError(
                        "epoch {} parameter {!r} has shape {} vs epoch {}'s {}".format(
                            epoch, key, value.shape, epochs[0], acc[key].shape))
                acc[key] += value
    scale = 1.0 / len(epochs)
    return [{key: jnp.asarray(value * scale, jnp.float32) for key, value in layer.items()}
            for layer in accumulated]


def load_params_with_character_remap(
        directory: Path, epoch: int,
        source_characters: List[str], target_characters: List[str],
        target_config: w2l.Wav2LetterConfig,
        loaded_first_layers_count: Optional[int] = None,
        init_rng: Optional[jax.Array] = None) -> w2l.Params:
    """Transfer-learning load (`/root/reference/speechless/net.py:209-269` semantics).

    Loads the donor checkpoint, copies the first ``loaded_first_layers_count`` layers
    (default: all), remaps the output layer's per-character filters to ``target_characters``
    (missing characters zero-initialized, blank -> blank), and freshly initializes any
    layers beyond ``loaded_first_layers_count``.
    """
    donor = load_params(directory, epoch)
    layer_count = len(target_config.layers)
    if loaded_first_layers_count is None:
        loaded_first_layers_count = layer_count

    if init_rng is None:
        init_rng = jax.random.PRNGKey(0)
    fresh = w2l.init_params(target_config, init_rng)

    ignored = sorted(set(source_characters) - set(target_characters))
    if ignored:
        log("Ignoring characters {} from loaded model.".format(ignored))
    extra = sorted(set(target_characters) - set(source_characters))
    if extra:
        log("Initializing extra characters {} not found in model.".format(extra))
    log("Loading first {} layers of {}, epoch {}, reinitializing the last {}.".format(
        loaded_first_layers_count, directory, epoch, layer_count - loaded_first_layers_count))

    params: w2l.Params = []
    for i in range(layer_count):
        if i >= loaded_first_layers_count:
            params.append(fresh[i])
        elif i == layer_count - 1:
            params.append(w2l.remap_output_layer(donor[i], source_characters,
                                                 target_characters))
        else:
            params.append({k: jnp.asarray(v) for k, v in donor[i].items()})
    return params
