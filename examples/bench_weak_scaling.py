"""Sharding-overhead scaling estimate on the virtual 8-device CPU mesh.

Only ONE real TPU chip is reachable in this image, so true multi-chip scaling cannot be
measured; what CAN be measured is what GSPMD partitioning itself adds. All 8 virtual CPU
devices share one physical core, so wall-clock per step is proportional to TOTAL compute
regardless of the mesh — therefore a mesh of size N at per-device batch b is compared
against a SINGLE device running the same total batch N*b. The difference is the cost of
partitioning + collectives (psum of gradients, the Megatron activation psums of the TP
pair); on real chips with per-chip compute this overhead is what separates measured
scaling from ideal weak scaling.

Round 4 (VERDICT #1): measures the REAL 250->2000-filter geometry by default — the wide
tail tensor parallelism exists for — and bounds single-core scheduling noise by
repeating every measurement (median-of-R reported with the spread). The collective
BYTE accounting (the part that transfers to real hardware) is in
`examples/tp_collective_audit.py` / `evidence/TP_AUDIT_r04.json`: dp4xtp2 moves LESS
per step than dp8 (61.0 vs 98.7 MB — TP halves the big-conv gradient all-reduce, adding
only 2.3 MB of activation psums), and an explicit activation sharding constraint
changes nothing (GSPMD already propagates the Megatron layout).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/bench_weak_scaling.py [--thin]
"""
import json
import os
import sys
import time
from pathlib import Path

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.parallel import mesh as pmesh
from speechless_tpu.train import (Batch, init_train_state, make_optimizer,
                                  make_train_step)

THIN = "--thin" in sys.argv
PER_DEVICE_BATCH = 8 if THIN else 2
T, U = (256, 24) if THIN else (128, 16)
STEPS = 20 if THIN else 5
REPS = 3  # median-of-R bounds single-core scheduling noise


def thin_config(graphemes=29):
    """The round-3 model: reference topology, thin filters (compiles in seconds)."""
    layers = (
        w2l.ConvSpec("striding_conv", 32, 48, 2, "relu", False),
        w2l.ConvSpec("inner_conv_1", 32, 7, 1, "relu", False),
        w2l.ConvSpec("inner_conv_2", 32, 7, 1, "relu", False),
        w2l.ConvSpec("big_conv_1", 64, 32, 1, "relu", False),
        w2l.ConvSpec("big_conv_2", 64, 1, 1, "relu", False),
        w2l.ConvSpec("output_conv", graphemes, 1, 1, "linear", False),
    )
    return w2l.Wav2LetterConfig(input_size_per_time_step=32,
                                grapheme_set_size=graphemes, layers=layers)


def real_config():
    """The reference's true geometry: 250-filter trunk, 2000-filter wide tail
    (`/root/reference/speechless/net.py:323-331`)."""
    return w2l.Wav2LetterConfig(input_size_per_time_step=128, grapheme_set_size=29)


def make_batch(rng, config, batch):
    labels = rng.randint(0, config.grapheme_set_size - 1,
                         size=(batch, U)).astype(np.int32)
    inputs = rng.randn(batch, T, config.input_size_per_time_step).astype(np.float32)
    return Batch(inputs=jax.numpy.asarray(inputs),
                 input_lengths=jax.numpy.full((batch,), T, jax.numpy.int32),
                 labels=jax.numpy.asarray(labels),
                 label_lengths=jax.numpy.full((batch,), U, jax.numpy.int32))


def timed_steps(step, state, batch, mesh=None):
    """Median-of-REPS per-step wall (plus min/max) after compile+warmup."""

    def run(n):
        nonlocal state
        for _ in range(n):
            state, metrics = step(state, batch)
        return float(metrics["loss"])  # value transfer = sync

    def measure():
        run(2)  # compile (first call) + warmup
        walls = []
        for _ in range(REPS):
            start = time.time()
            run(STEPS)
            walls.append((time.time() - start) / STEPS)
        return walls

    if mesh is not None:
        with jax.set_mesh(mesh):
            walls = measure()
    else:
        walls = measure()
    return float(np.median(walls)), min(walls), max(walls)


def main() -> None:
    config = thin_config() if THIN else real_config()
    optimizer = make_optimizer(1e-4)
    rng = np.random.RandomState(0)
    rows = []
    single_wall = {}
    # Single-device anchors at each total batch (same total compute on the same core).
    for n in (1, 2, 4, 8):
        state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(config, optimizer, donate=False)
        wall, lo, hi = timed_steps(step, state,
                                   make_batch(rng, config, n * PER_DEVICE_BATCH))
        single_wall[n] = wall
        print("single-device  batch={:3d}: {:7.1f} ms/step  [{:.1f}, {:.1f}]".format(
            n * PER_DEVICE_BATCH, wall * 1e3, lo * 1e3, hi * 1e3), flush=True)
    # DP meshes (and one DP+TP mesh) at fixed per-device batch.
    for n, model_parallelism in ((2, 1), (4, 1), (8, 1), (8, 2)):
        mesh = pmesh.make_mesh(jax.devices()[:n], model_parallelism=model_parallelism)
        shardings = pmesh.param_shardings(mesh, config.layer_names)
        state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
        state = state._replace(params=pmesh.shard_params(state.params, shardings),
                               opt_state=optimizer.init(
                                   pmesh.shard_params(state.params, shardings)))
        step = make_train_step(config, optimizer, donate=False)
        batch = make_batch(rng, config, n * PER_DEVICE_BATCH)
        batch = jax.tree.map(
            lambda x: jax.device_put(x, pmesh.batch_sharding(mesh, x.ndim)), batch)
        wall, lo, hi = timed_steps(step, state, batch, mesh=mesh)
        overhead = wall / single_wall[n] - 1.0
        label = "dp={} tp={}".format(n // model_parallelism, model_parallelism)
        rows.append({"mesh": label, "devices": n,
                     "per_device_batch": PER_DEVICE_BATCH,
                     "step_ms": round(wall * 1e3, 1),
                     "step_ms_min": round(lo * 1e3, 1),
                     "step_ms_max": round(hi * 1e3, 1),
                     "same_compute_single_device_ms": round(single_wall[n] * 1e3, 1),
                     "partitioning_overhead_pct": round(overhead * 100, 1)})
        print("mesh {:11s}: {:7.1f} ms/step [{:.1f}, {:.1f}] vs single {:7.1f} "
              "-> overhead {:+.1f}%".format(label, wall * 1e3, lo * 1e3, hi * 1e3,
                                            single_wall[n] * 1e3, overhead * 100),
              flush=True)
    out = {"note": "8 virtual CPU devices share ONE physical core: absolute walls track "
                   "total compute, so each mesh is compared against a single device "
                   "running the identical total batch; the delta is GSPMD partitioning "
                   "+ collective cost. Medians of {} repetitions of {}-step runs; "
                   "min/max bound single-core scheduling noise. Collective BYTES "
                   "(the hardware-transferable term) are in TP_AUDIT_r04.json."
                   .format(REPS, STEPS),
           "model": ("thin-filter wav2letter" if THIN else
                     "REAL wav2letter geometry (250-filter trunk, 2000-filter tail)"),
           "shape": {"T": T, "U": U, "per_device_batch": PER_DEVICE_BATCH},
           "rows": rows}
    name = "WEAK_SCALING_r04_thin.json" if THIN else "WEAK_SCALING_r04.json"
    path = Path(__file__).resolve().parent.parent / "evidence" / name
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
