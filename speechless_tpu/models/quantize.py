"""Weight-only int8 quantization for inference.

Serving a single utterance is weight-bandwidth-bound: every request streams the whole
conv stack (~23M params) from HBM while the MXU sits mostly idle, so shrinking the
weights 4x (vs f32 checkpoints) directly cuts request latency on small batches — and
cuts deployment-bundle size the same 4x. Quantization is symmetric per output channel
(axis O of the "WIO" conv weights): ``w ~= w_q * w_scale`` with ``w_q`` int8 in
[-127, 127]. Biases and any non-conv leaves (e.g. the trainable-ASG pseudo-layer) stay
float — they are bandwidth noise.

The dequantize multiply happens inside the jitted program right before the conv
(`models/wav2letter.py::apply` accepts either layout), so XLA fuses it into the conv's
operand read; no dequantized copy ever lands in HBM. Training always uses float
weights — this is an inference-only transform (the reference has no quantization
story at all).
"""
from typing import List

import numpy as np

from . import wav2letter as w2l

INT8_MAX = 127.0


def quantize_params_int8(params: w2l.Params) -> List[dict]:
    """Symmetric per-output-channel int8 quantization of every conv weight.

    Returns a params-shaped list of dicts where each ``{"w": ...}`` becomes
    ``{"w_q": int8, "w_scale": float32[out_channels]}``; all other keys pass through
    unchanged. Accepted directly by `wav2letter.apply` and the serving programs.
    """
    quantized = []
    for layer in params:
        qlayer = {}
        for key, value in layer.items():
            if key == "w":
                w = np.asarray(value, dtype=np.float32)
                scale = np.maximum(np.max(np.abs(w), axis=(0, 1)) / INT8_MAX, 1e-12)
                qlayer["w_q"] = np.clip(np.round(w / scale), -INT8_MAX, INT8_MAX
                                        ).astype(np.int8)
                qlayer["w_scale"] = scale.astype(np.float32)
            else:
                qlayer[key] = np.asarray(value)
        quantized.append(qlayer)
    return quantized


def dequantize_params(qparams: List[dict]) -> w2l.Params:
    """Exact inverse layout transform: ``w = w_q * w_scale`` as float32 (lossy only by
    the original quantization rounding)."""
    params = []
    for qlayer in qparams:
        layer = dict(qlayer)
        if "w_q" in layer:
            layer["w"] = (layer.pop("w_q").astype(np.float32) * layer.pop("w_scale"))
        params.append(layer)
    return params


def quantization_error(params: w2l.Params) -> float:
    """Max absolute weight error of a quantize->dequantize round trip (diagnostics)."""
    round_trip = dequantize_params(quantize_params_int8(params))
    return max(float(np.max(np.abs(np.asarray(a["w"], np.float32)
                                   - np.asarray(b["w"], np.float32))))
               for a, b in zip(params, round_trip) if "w" in a)
