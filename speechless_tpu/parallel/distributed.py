"""Multi-host bootstrap: `jax.distributed` initialization, global-array feeding helpers,
and a localhost multi-process CPU dry run that exercises the real bootstrap.

The reference is strictly single-process (SURVEY.md §2c); the TPU-native plan is
DP/TP over a global mesh with per-host input sharding. This module provides

* `distributed_init` — idempotent `jax.distributed.initialize` wrapper (env-var or
  explicit coordinator);
* `put_global` / `local_batch_to_global` — place host data onto a (multi-host) mesh:
  replicated pytrees via `jax.make_array_from_callback`, per-host batch shards via
  `jax.make_array_from_process_local_data` (the standard JAX multi-host feeding pattern,
  matching `data.batching.ShardedBatchGenerator`'s per-host slices);
* `run_multiprocess_dryrun` — spawn N real OS processes on localhost, each with its own
  virtual CPU devices, `jax.distributed.initialize` against a shared coordinator, build
  the global (data, model) mesh, feed per-process batch shards, and run one full train
  step — validating the bootstrap itself, not just single-process sharding math.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Initialize `jax.distributed` (idempotent). With no arguments, JAX auto-detects
    cluster parameters from the environment (TPU pod metadata / standard env vars:
    ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)."""
    import jax

    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id,
                               local_device_ids=local_device_ids)
    from ..utils.tools import log
    log("jax.distributed initialized: process {}/{} with {} local of {} global devices."
        .format(jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count()))


def put_global(mesh, spec, host_array) -> Any:
    """Place a host array (present identically on every process) onto the mesh with the
    given PartitionSpec. Works single- and multi-process (each process materializes only
    its addressable shards)."""
    import jax
    from jax.sharding import NamedSharding

    host_array = np.asarray(host_array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(host_array.shape, sharding,
                                        lambda index: host_array[index])


def shard_params_global(mesh, params: Any, specs: Any) -> Any:
    """Multi-host-safe variant of `mesh.shard_params`: every process holds the full
    host-side pytree (same seed init or same checkpoint); each materializes its shards."""
    import jax

    return jax.tree.map(lambda x, s: put_global(mesh, s, x), params, specs)


def local_batch_to_global(mesh, batch: Any) -> Any:
    """Assemble a global batch from this process's local shard (a `trainer.Batch`/
    `WavBatch`-style NamedTuple of arrays with a leading batch axis). The per-process
    slices concatenate in process order to the global batch — exactly the slices
    `ShardedBatchGenerator` yields."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS

    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return type(batch)(*(put(field) for field in batch))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_multiprocess_dryrun(n_processes: int = 2, devices_per_process: int = 4,
                            model_parallelism: int = 2, timeout_s: float = 600.0) -> None:
    """Validate the multi-host bootstrap end-to-end on localhost: N OS processes, each
    with ``devices_per_process`` virtual CPU devices, coordinate via `jax.distributed`,
    build one global mesh, and run a sharded train step on per-process input shards.

    Raises on any process failure, non-finite loss, or cross-process loss mismatch."""
    port = _free_port()
    workers = []
    for process_id in range(n_processes):
        env = dict(os.environ)
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count={} ".format(
            devices_per_process) + env.get("XLA_FLAGS", "")).strip()
        env["SPEECHLESS_DRYRUN_COORD"] = "localhost:{}".format(port)
        env["SPEECHLESS_DRYRUN_NPROC"] = str(n_processes)
        env["SPEECHLESS_DRYRUN_PID"] = str(process_id)
        env["SPEECHLESS_DRYRUN_MP"] = str(model_parallelism)
        workers.append(subprocess.Popen(
            [sys.executable, "-m", "speechless_tpu.parallel.distributed"],
            env=env, cwd=str(_REPO_ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    failed = []
    for process_id, worker in enumerate(workers):
        try:
            out, _ = worker.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            worker.kill()
            out, _ = worker.communicate()
            failed.append((process_id, "timeout", out))
            continue
        outputs.append(out)
        if worker.returncode != 0:
            failed.append((process_id, "exit {}".format(worker.returncode), out))
    if failed:
        raise RuntimeError("multi-process dryrun failed:\n" + "\n".join(
            "--- process {} ({}) ---\n{}".format(pid, why, out) for pid, why, out in failed))
    for out in outputs:
        assert "DRYRUN_OK" in out, "worker missing success marker:\n" + out
    print("run_multiprocess_dryrun OK: {} processes x {} devices, model_parallelism={}"
          .format(n_processes, devices_per_process, model_parallelism))


def _dryrun_worker() -> None:
    """Entry point for one dry-run process (see `run_multiprocess_dryrun`)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend init (axon pins TPU)
    coordinator = os.environ["SPEECHLESS_DRYRUN_COORD"]
    n_processes = int(os.environ["SPEECHLESS_DRYRUN_NPROC"])
    process_id = int(os.environ["SPEECHLESS_DRYRUN_PID"])
    model_parallelism = int(os.environ["SPEECHLESS_DRYRUN_MP"])
    distributed_init(coordinator_address=coordinator, num_processes=n_processes,
                     process_id=process_id)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from ..models import wav2letter as w2l
    from ..text.charsets import english_frequent_characters
    from ..train.trainer import Batch, init_train_state, make_optimizer, make_train_step
    from . import mesh as pmesh

    assert jax.process_count() == n_processes
    mesh = pmesh.make_mesh(model_parallelism=model_parallelism)

    config = w2l.Wav2LetterConfig(
        input_size_per_time_step=16,
        grapheme_set_size=len(english_frequent_characters) + 1)
    optimizer = make_optimizer(1e-4)
    # Same seed on every process -> identical host params; shard via global placement.
    state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
    specs = pmesh.param_specs(config.layer_names)
    params = shard_params_global(mesh, jax.tree.map(np.asarray, state.params), specs)
    state = state._replace(params=params, opt_state=optimizer.init(params))

    # The deterministic global batch, sliced per process (the ShardedBatchGenerator
    # pattern): every process computes the same global data, keeps its slice.
    data_parallelism = jax.device_count() // model_parallelism
    global_batch = 2 * data_parallelism
    per_process = global_batch // n_processes
    rng = np.random.RandomState(0)
    inputs = rng.randn(global_batch, 64, 16).astype(np.float32)
    labels = rng.randint(0, config.grapheme_set_size - 1,
                         size=(global_batch, 8)).astype(np.int32)
    lo, hi = process_id * per_process, (process_id + 1) * per_process
    local = Batch(inputs=inputs[lo:hi],
                  input_lengths=np.full(per_process, 64, np.int32),
                  labels=labels[lo:hi],
                  label_lengths=np.full(per_process, 8, np.int32))
    batch = local_batch_to_global(mesh, local)

    step = make_train_step(config, optimizer, donate=False)
    with jax.set_mesh(mesh):
        _, metrics = step(state, batch)
        # The loss is fully replicated over the mesh: every process can fetch it.
        loss = float(metrics["loss"])
    losses = np.asarray(multihost_utils.process_allgather(np.float64(loss), tiled=False))
    assert np.all(np.isfinite(losses)), "non-finite loss: {}".format(losses)
    assert np.allclose(losses, losses[0]), "loss differs across processes: {}".format(losses)
    print("DRYRUN_OK process {}/{}: loss {:.4f} on {} global devices".format(
        jax.process_index(), jax.process_count(), float(losses[0]), jax.device_count()))


if __name__ == "__main__":
    _dryrun_worker()
