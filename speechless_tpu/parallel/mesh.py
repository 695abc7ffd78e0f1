"""Device mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §2c: no DP/TP/PP of any kind); here
parallel training is first-class and TPU-native: a ``(data, model)`` ``jax.sharding.Mesh``
over the slice, with

* **data parallelism** (primary): the batch dimension of every input array is sharded over
  the ``data`` axis; gradients are combined by XLA's SPMD partitioner as reduce-scatter /
  all-reduce over ICI — no hand-written collectives;
* **tensor parallelism** (for the wide 2000-filter tail of wav2letter): big_conv_1 is
  column-parallel (output channels sharded), big_conv_2 row-parallel (input channels
  sharded) — the classic pair that needs a single psum at the pair's end, which GSPMD
  inserts automatically from the parameter shardings.

Shardings are expressed as `NamedSharding` annotations on params/batches and handed to
``jax.jit``; XLA chooses the collective schedule (ICI within a slice).
"""
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallelism: int = 1) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices`` (defaults to ALL global devices —
    across processes under `jax.distributed`).

    ``model_parallelism`` devices form the model axis (must divide the device count);
    the rest go to data parallelism. Topology-aware: `mesh_utils.create_device_mesh`
    orders the grid from the physical TPU coordinates so the innermost (model) axis maps
    to nearest ICI neighbors and, on multi-host slices, each host's devices stay
    contiguous on the data axis; the flat reshape is only a fallback for device subsets
    the topology helpers reject (e.g. an explicit slice of CPU devices in tests)."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % model_parallelism != 0:
        raise ValueError("model_parallelism {} must divide device count {}".format(
            model_parallelism, len(devices)))
    shape = (len(devices) // model_parallelism, model_parallelism)
    try:
        from jax.experimental import mesh_utils

        if not explicit and jax.process_count() > 1 and shape[0] % jax.process_count() == 0:
            # Multi-host: model axis within each host's fast ICI neighborhood, data axis
            # spanning hosts (gradient all-reduce tolerates the slower cross-host hops).
            grid = mesh_utils.create_hybrid_device_mesh(
                (shape[0] // jax.process_count(), shape[1]),
                (jax.process_count(), 1), devices=devices)
        else:
            grid = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        grid = np.array(devices).reshape(shape)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Inputs/labels/lengths: shard the leading batch dimension over the data axis."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def param_specs(layer_names: List[str]) -> List[Dict[str, P]]:
    """Per-layer PartitionSpecs for the wav2letter parameter pytree.

    Megatron-style TP on the wide tail; everything else replicated (the 250-filter trunk is
    too small to shard profitably — its weights fit in VMEM and DP keeps the MXU busy).
    Weight layout is (kernel, in_channels, out_channels).
    """
    specs = []
    for name in layer_names:
        if name == "big_conv_1":
            specs.append({"w": P(None, None, MODEL_AXIS), "b": P(MODEL_AXIS)})
        elif name == "big_conv_2":
            specs.append({"w": P(None, MODEL_AXIS, None), "b": P()})
        else:
            specs.append({"w": P(), "b": P()})
    return specs


def param_shardings(mesh: Mesh, layer_names: List[str]) -> List[Dict[str, NamedSharding]]:
    return [{k: NamedSharding(mesh, spec) for k, spec in layer.items()}
            for layer in param_specs(layer_names)]


def shard_params(params: Any, shardings: Any) -> Any:
    """Place a parameter pytree onto the mesh according to ``shardings``."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


def replicate(mesh: Mesh, value: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), value)
