"""Measure gradient rematerialization's HBM effect: XLA's compiled memory analysis of
the training step with and without ``remat=True``, at a shape where activations bind.

No training runs — `jit(...).lower(...).compile().memory_analysis()` reports the
executable's peak temp allocation straight from the compiler, so the numbers are the
real allocator facts for the target backend (run on the TPU for the headline figure).

    python examples/remat_memory.py --batch-size 64 --frames 2048 \
        --out evidence/REMAT_r03.json
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from speechless_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--frames", type=int, default=2048)
    parser.add_argument("--label-length", type=int, default=256)
    parser.add_argument("--criterion", default="ctc_pallas")
    parser.add_argument("--steps", type=int, default=0,
                        help="also execute N chained steps per mode and report the "
                             "measured per-step wall (the remat recompute cost)")
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechless_tpu.models import wav2letter as w2l
    from speechless_tpu.train import trainer
    from speechless_tpu.utils.tools import log

    platform = jax.devices()[0].platform
    log("platform: {}".format(platform))
    criterion = args.criterion if platform == "tpu" else "ctc"
    compute = jnp.bfloat16 if platform == "tpu" else jnp.float32

    batch = trainer.Batch(
        inputs=jnp.zeros((args.batch_size, args.frames, 128), jnp.float32),
        input_lengths=jnp.full((args.batch_size,), args.frames, jnp.int32),
        labels=jnp.zeros((args.batch_size, args.label_length), jnp.int32),
        label_lengths=jnp.full((args.batch_size,), args.label_length, jnp.int32))

    results = {"platform": platform, "batch_size": args.batch_size,
               "frames": args.frames, "criterion": criterion}
    for remat in (False, True):
        config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                      grapheme_set_size=29, compute_dtype=compute,
                                      remat=remat)
        optimizer = trainer.make_optimizer()
        state = trainer.init_train_state(config, optimizer, jax.random.PRNGKey(0))
        # donate=False: donated buffers would be reported as aliased outputs and
        # muddy the temp-size comparison.
        step = trainer.make_train_step(config, optimizer, donate=False,
                                       criterion=criterion)
        analysis = step.lower(state, batch).compile().memory_analysis()
        row = {
            "temp_size_mb": round(analysis.temp_size_in_bytes / 2**20, 1),
            "argument_size_mb": round(analysis.argument_size_in_bytes / 2**20, 1),
            "output_size_mb": round(analysis.output_size_in_bytes / 2**20, 1),
        }
        if args.steps:
            import time

            # Chain steps and fetch ONE loss at the end: per-dispatch RTT (~24 ms on
            # the tunnel) amortizes, and the value transfer is the sync barrier
            # (block_until_ready is a no-op over the tunneled backend).
            metrics = None
            state, metrics = step(state, batch)  # warm-up dispatch
            float(metrics["loss"])
            t0 = time.time()
            for _ in range(args.steps):
                state, metrics = step(state, batch)
            float(metrics["loss"])
            row["step_ms"] = round((time.time() - t0) / args.steps * 1e3, 1)
        results["remat" if remat else "baseline"] = row
        log("remat={}: temp {} MB, args {} MB, outputs {} MB{}".format(
            remat, row["temp_size_mb"], row["argument_size_mb"],
            row["output_size_mb"],
            ", step {} ms".format(row["step_ms"]) if args.steps else ""))
        del state, step

    results["temp_reduction"] = round(
        results["baseline"]["temp_size_mb"]
        / max(results["remat"]["temp_size_mb"], 0.1), 2)
    log("peak temp reduction: {}x".format(results["temp_reduction"]))

    if args.out:
        args.out.write_text(json.dumps(results, indent=2))
        log("wrote {}".format(args.out))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
