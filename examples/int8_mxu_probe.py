"""int8 MXU probe — settles round-4 VERDICT weak #1 ("is int8_compute real?").

QUANT_r04.json measured int8_mxu at +1% over weight-only dequant at bs=16 serving
(decode + RTT on the clock) with a 2.1x longer cold wall, leaving the engineering
question open: does `Wav2LetterConfig.int8_compute` actually lower the wide convs to
s8 x s8 -> s32 on the MXU (v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s), or does XLA
silently upcast? And where can the 2x int8 MXU rate show up end-to-end?

Three measurements, written to evidence/QUANT_MXU_r05.json:

1. **HLO audit** — compile the forward at a serving shape per variant and scan the
   optimized HLO for `convolution` ops' operand/result dtypes. Native int8 shows as
   `s32[...] convolution(s8[...], s8[...])`; an upcast shows as float convs fed by
   `convert` from s8.
2. **Compute-bound roofline** — chain K forward passes on-device (`lax.scan`, one
   scalar fetch) at a large batch so dispatch RTT, decode, and transfers are off the
   clock; report achieved TF(OP)/s = analytic conv FLOPs / wall for bf16,
   weight-only dequant (bf16 compute), and int8_compute. Any rate ABOVE the 197
   bf16 peak is throughput-proof of native int8 MXU issue. The analytic Amdahl
   ceiling from the wide convs' FLOPs share is printed alongside.
3. **Cold-wall decomposition** — per-variant `.lower()` + `.compile()` wall and
   optimized-HLO op counts (the QUANT_r04 330 s vs 155 s cold gap is compile time;
   this pins which variant's graph is bigger and by how much). The persistent
   compilation cache is deliberately NOT enabled so compiles are genuinely cold.

    python examples/int8_mxu_probe.py                          # TPU, B=64
    python examples/int8_mxu_probe.py --batch 128 --steps 24
    python examples/int8_mxu_probe.py --platform cpu --batch 2 --steps 2 --frames 64

Reference context: the reference serves float Keras models only (net.py); int8 is a
beyond-reference serving mode, so the bar is an honest measured verdict either way.
"""
import argparse
import json
import re
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


DEF_RE = re.compile(r"%([\w.-]+)\s*=\s*(\w+)\[")
OP_RE = re.compile(r"%([\w.-]+)")


def conv_signatures(hlo_text: str):
    """(result_dtype, lhs_dtype, rhs_dtype) for every convolution/dot in optimized HLO.

    Optimized HLO prints operands as bare instruction names, so dtypes are resolved
    via a first pass over all `%name = dtype[...]` definitions. A fusion operand's
    dtype is its output dtype — exactly what feeds the MXU op.
    """
    dtypes = {}
    for m in DEF_RE.finditer(hlo_text):
        dtypes.setdefault(m.group(1), m.group(2))
    sigs = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        m = DEF_RE.search(stripped)  # first `%name = dtype[` is the definition
        if not m:
            continue
        for op in ("convolution(", " dot("):
            idx = stripped.find(op)
            if idx < 0:
                continue
            operands = OP_RE.findall(stripped[idx:])
            lhs = dtypes.get(operands[0], "?") if operands else "?"
            rhs = dtypes.get(operands[1], "?") if len(operands) > 1 else "?"
            sigs.append((m.group(2), lhs, rhs, op.strip().rstrip("(")))
    return sigs


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--frames", type=int, default=512, help="input spectrogram frames")
    parser.add_argument("--steps", type=int, default=16, help="chained forwards per dispatch")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "QUANT_MXU_r05.json")
    args = parser.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from speechless_tpu.models import wav2letter as w2l
    from speechless_tpu.models.quantize import quantize_params_int8
    from speechless_tpu.text.charsets import english_frequent_characters
    from speechless_tpu.utils.tools import log

    n_graphemes = len(english_frequent_characters) + 1
    base = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                grapheme_set_size=n_graphemes,
                                compute_dtype=jnp.bfloat16)
    params = w2l.init_params(base, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(params)

    variants = {
        "bf16": (base, params),
        "int8_weight_only": (base, qparams),
        "int8_compute": (w2l.Wav2LetterConfig(
            input_size_per_time_step=128, grapheme_set_size=n_graphemes,
            compute_dtype=jnp.bfloat16, int8_compute=True), qparams),
    }

    x = np.random.default_rng(1).standard_normal(
        (args.batch, args.frames, 128)).astype(np.float32)
    x_dev = jax.device_put(x)

    flops_fwd = args.batch * w2l.conv_flops_per_example(base, args.frames, train=False)
    # Amdahl ceiling: only the wide convs run int8; their FLOPs share bounds the win.
    frames = args.frames
    per_layer = {}
    in_ch = base.input_size_per_time_step
    for spec in base.layers:
        frames = (frames + spec.stride - 1) // spec.stride
        per_layer[spec.name] = 2.0 * frames * spec.kernel_size * in_ch * spec.filters
        in_ch = spec.filters
    big_share = sum(v for k, v in per_layer.items() if k.startswith("big_conv")) \
        / sum(per_layer.values())
    amdahl_2x = 1.0 / (1.0 - big_share / 2.0)

    result = {
        "platform": args.platform, "batch": args.batch, "frames": args.frames,
        "steps_per_dispatch": args.steps, "reps": args.reps,
        "wide_conv_flops_share": round(big_share, 4),
        "amdahl_ceiling_if_int8_2x": round(amdahl_2x, 4),
        "variants": {},
    }

    for name, (config, p) in variants.items():
        log("--- variant: {}".format(name))
        p_dev = jax.device_put(p)

        def chain(pp, inp, config=config):
            def body(carry, _):
                out = w2l.apply(config, pp, inp + carry)
                return out.astype(jnp.float32).mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.steps)
            return s

        fn = jax.jit(chain)
        t0 = time.monotonic()
        lowered = fn.lower(p_dev, x_dev)
        t_lower = time.monotonic() - t0
        t0 = time.monotonic()
        compiled = lowered.compile()
        t_compile = time.monotonic() - t0
        hlo = compiled.as_text()
        sigs = conv_signatures(hlo)
        sig_counts = {}
        for s in sigs:
            key = "{3}: {0} <- {1} x {2}".format(*s)
            sig_counts[key] = sig_counts.get(key, 0) + 1
        n_convert_s8 = len(re.findall(r"convert\(\s*s8\[", hlo))

        # warm-up + timed reps; value transfer is the sync (tunnel block_until_ready
        # is a no-op — see CLAUDE.md).
        float(compiled(p_dev, x_dev))
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            float(compiled(p_dev, x_dev))
            walls.append(time.monotonic() - t0)
        walls.sort()
        median = walls[len(walls) // 2]
        tflops = flops_fwd * args.steps / median / 1e12
        log("  median {:.1f} ms/dispatch -> {:.1f} TF/s; convs: {} (convert(s8)={})"
            .format(median * 1e3, tflops, sig_counts, n_convert_s8))
        result["variants"][name] = {
            "lower_s": round(t_lower, 2), "compile_s": round(t_compile, 2),
            "hlo_convolutions": sig_counts,
            "hlo_convert_from_s8": n_convert_s8,
            "hlo_bytes": len(hlo),
            "walls_s": [round(w, 4) for w in walls],
            "median_wall_s": round(median, 4),
            "achieved_tflops": round(tflops, 1),
        }

    bf16_w = result["variants"]["bf16"]["median_wall_s"]
    i8_w = result["variants"]["int8_compute"]["median_wall_s"]
    wo_w = result["variants"]["int8_weight_only"]["median_wall_s"]
    i8_convs = result["variants"]["int8_compute"]["hlo_convolutions"]
    native = any("s32 <- s8 x s8" in k for k in i8_convs)
    result["verdict"] = {
        "int8_convs_native_s8s8_s32": native,
        "int8_vs_bf16_speedup": round(bf16_w / i8_w, 3),
        "int8_vs_weight_only_speedup": round(wo_w / i8_w, 3),
    }
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
