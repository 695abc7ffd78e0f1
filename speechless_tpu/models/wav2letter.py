"""The wav2letter acoustic model (Collobert et al., arXiv:1609.03193) as a functional JAX
conv stack.

Geometry matches the reference net (`/root/reference/speechless/net.py:291-348`):

* optional raw-wave frontend conv (250 filters, k=250, stride 160);
* striding conv (250, k=48, stride 2);
* 7 inner convs (250, k=7);
* big_conv_1 (2000, k=32), big_conv_2 (2000, k=1);
* output conv (grapheme_set_size, k=1) — **linear logits** here (softmax is applied at the
  API boundary for parity; training consumes logits directly for numerics);
* all convs 'SAME'-padded, ReLU by default, optional dropout before every non-"big" conv;
* output/input length ratio = product of strides (2 for mel input, 320 for raw waves).

TPU-first design notes: parameters are a plain list-of-dicts pytree (easy to shard, remap
for transfer learning, and checkpoint); compute runs in a configurable dtype (bfloat16 on
TPU) with float32 params and float32 logits; convs lower to XLA `conv_general_dilated`,
which maps onto the MXU.
"""
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = List[Dict[str, jnp.ndarray]]

MAIN_FILTER_COUNT = 250
BIG_FILTER_COUNT = 2000


@dataclass(frozen=True)
class ConvSpec:
    name: str
    filters: int
    kernel_size: int
    stride: int = 1
    activation: str = "relu"
    dropout_before: bool = False


@dataclass(frozen=True)
class Wav2LetterConfig:
    """Architecture + precision configuration for one model instance."""
    input_size_per_time_step: int
    grapheme_set_size: int
    use_raw_wave_input: bool = False
    activation: str = "relu"
    dropout: Optional[float] = None
    compute_dtype: Any = jnp.float32  # bfloat16 on TPU for the fast path
    # Gradient rematerialization (`jax.checkpoint`): the training forward stores only
    # block-boundary activations and the backward pass recomputes the rest — trading
    # one extra block forward (~1.33x step FLOPs) for dropping most stored
    # activations, the standard TPU lever for larger batches / longer buckets when
    # HBM binds. Inference paths are unaffected (remat applies under train=True only).
    remat: bool = False
    # Tensor parallelism: explicitly pin the big_conv_1 output activations to
    # P(data, None, model) — Megatron's column->row conv pair keeps the intermediate
    # sharded on channels with NO collective between the two convs; the lone psum
    # after big_conv_2 is inserted by GSPMD from the parameter shardings. GSPMD
    # usually propagates this from the weights alone, so the flag exists to make the
    # layout an invariant rather than an inference (audited by
    # examples/tp_collective_audit.py). Requires a (data, model) mesh in context.
    tp_activation_constraint: bool = False
    # int8 MXU compute (inference only): with int8-quantized weights
    # (`models/quantize.py` layout), run the WIDE convs as int8 x int8 ->
    # int32-accumulated convolutions on the MXU (v5e: 394 int8 TOPS vs 197 bf16
    # TFLOP/s) instead of dequantizing to the compute dtype. Activations are
    # dynamically quantized per tensor (symmetric, scale = max|x|/127 — no
    # calibration pass); the narrow trunk stays dequant-bf16 (its FLOPs are noise
    # and per-tensor activation quant there would feed quantization error into
    # every later layer for no speedup). Ignored for layers stored as float.
    int8_compute: bool = False
    layers: Tuple[ConvSpec, ...] = field(default=None)

    def __post_init__(self):
        if self.layers is None:
            object.__setattr__(self, "layers", tuple(self._build_layers()))

    def _build_layers(self) -> List[ConvSpec]:
        act = self.activation
        use_dropout = self.dropout is not None
        layers = []
        if self.use_raw_wave_input:
            layers.append(ConvSpec("wave_conv", MAIN_FILTER_COUNT, 250, 160, act, use_dropout))
        layers.append(ConvSpec("striding_conv", MAIN_FILTER_COUNT, 48, 2, act, use_dropout))
        for i in range(1, 8):
            layers.append(ConvSpec("inner_conv_{}".format(i), MAIN_FILTER_COUNT, 7, 1, act,
                                   use_dropout))
        layers.append(ConvSpec("big_conv_1", BIG_FILTER_COUNT, 32, 1, act, False))
        layers.append(ConvSpec("big_conv_2", BIG_FILTER_COUNT, 1, 1, act, False))
        # Linear logits; the reference's softmax output activation is applied by callers.
        layers.append(ConvSpec("output_conv", self.grapheme_set_size, 1, 1, "linear", False))
        return layers

    @property
    def layer_names(self) -> List[str]:
        return [spec.name for spec in self.layers]

    @property
    def input_to_prediction_length_ratio(self) -> int:
        """Striding shrink factor: frames in -> predictions out (`net.py:343-348`)."""
        ratio = 1
        for spec in self.layers:
            ratio *= spec.stride
        return ratio


def init_params(config: Wav2LetterConfig, rng: jax.Array) -> Params:
    """Glorot-uniform weights + zero biases (Keras Conv1D defaults, for init parity)."""
    params = []
    in_channels = config.input_size_per_time_step
    for spec in config.layers:
        rng, key = jax.random.split(rng)
        fan_in = spec.kernel_size * in_channels
        fan_out = spec.kernel_size * spec.filters
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(key, (spec.kernel_size, in_channels, spec.filters),
                               minval=-limit, maxval=limit, dtype=jnp.float32)
        params.append({"w": w, "b": jnp.zeros((spec.filters,), jnp.float32)})
        in_channels = spec.filters
    return params


def _activate(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "elu":
        return jax.nn.elu(x)
    if activation == "linear":
        return x
    if activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise ValueError("Unknown activation: {}".format(activation))


def _maybe_constrain_tp(config: Wav2LetterConfig, spec: ConvSpec,
                        x: jnp.ndarray) -> jnp.ndarray:
    """Pin the wide tail's intermediate activation sharding (see
    `Wav2LetterConfig.tp_activation_constraint`)."""
    if config.tp_activation_constraint and spec.name == "big_conv_1":
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P("data", None, "model"))
    return x


def _layer_apply(config: Wav2LetterConfig, spec: ConvSpec, layer_params,
                 x: jnp.ndarray, dropout_key: Optional[jax.Array]) -> jnp.ndarray:
    if dropout_key is not None and spec.dropout_before and config.dropout:
        keep = jax.random.bernoulli(dropout_key, 1.0 - config.dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - config.dropout), 0.0).astype(config.compute_dtype)
    # Conv runs natively in the compute dtype: on TPU the MXU accumulates bf16 inputs
    # in f32 internally; keeping in/out dtypes equal also keeps the transposed
    # (backward) convs dtype-consistent.
    if "w" in layer_params:
        w = layer_params["w"].astype(config.compute_dtype)
    elif (config.int8_compute and spec.name.startswith("big_conv")):
        # int8 MXU path (see `Wav2LetterConfig.int8_compute`): dynamic per-tensor
        # activation quant, int8 x int8 conv with int32 accumulation, one fused
        # rescale by (activation_scale * per-channel weight_scale).
        activation_scale = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                                       1e-12) / 127.0
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / activation_scale),
                       -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            x_q, layer_params["w_q"], window_strides=(spec.stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32)
        x = (acc.astype(jnp.float32)
             * (activation_scale * layer_params["w_scale"])
             ).astype(config.compute_dtype)
        x = x + layer_params["b"].astype(config.compute_dtype)
        return _maybe_constrain_tp(config, spec, _activate(x, spec.activation))
    else:
        # int8 weight-only quantization (models/quantize.py): dequantize in-program
        # so XLA fuses the multiply into the conv's operand read (inference only).
        w = (layer_params["w_q"].astype(jnp.float32) * layer_params["w_scale"]
             ).astype(config.compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(spec.stride,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    x = x + layer_params["b"].astype(config.compute_dtype)
    return _maybe_constrain_tp(config, spec, _activate(x, spec.activation))


def _remat_block_starts(config: Wav2LetterConfig) -> List[int]:
    """Checkpoint-block boundaries: one block of the narrow (250-filter) front, one of
    the wide tail from big_conv_1 — whose (B, T', 2000) activations dominate training
    memory. Stored residuals shrink to the block inputs (features + one 250-wide
    tensor); everything else is recomputed during backward."""
    names = config.layer_names
    return [0, names.index("big_conv_1")] if "big_conv_1" in names else [0]


def apply(config: Wav2LetterConfig, params: Params, inputs: jnp.ndarray, *,
          train: bool = False, dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Forward pass: ``(batch, time, features) -> (batch, time/stride_ratio, graphemes)``
    logits (float32)."""
    x = inputs.astype(config.compute_dtype)
    use_dropout = train and config.dropout
    if use_dropout:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for training with dropout")
        keys = list(jax.random.split(dropout_rng, len(config.layers)))
    else:
        keys = [None] * len(config.layers)

    if config.remat and train:
        starts = _remat_block_starts(config)
        for block_index, start in enumerate(starts):
            end = (starts[block_index + 1] if block_index + 1 < len(starts)
                   else len(config.layers))

            def block(x, block_params, block_keys, start=start, end=end):
                for i, spec in enumerate(config.layers[start:end]):
                    key = block_keys[i] if use_dropout else None
                    x = _layer_apply(config, spec, block_params[i], x, key)
                return x

            block_keys = (tuple(keys[start:end]) if use_dropout else ())
            x = jax.checkpoint(block)(x, tuple(params[start:end]), block_keys)
    else:
        for spec, layer_params, key in zip(config.layers, params, keys):
            x = _layer_apply(config, spec, layer_params, x,
                             key if use_dropout else None)
    return x.astype(jnp.float32)


def probabilities(config: Wav2LetterConfig, params: Params, inputs: jnp.ndarray) -> jnp.ndarray:
    """Softmax grapheme probabilities — the reference `predictive_net` output surface."""
    return jax.nn.softmax(apply(config, params, inputs), axis=-1)


def prediction_lengths(config: Wav2LetterConfig, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """Valid output frames per example: ``input_length // stride_ratio`` (`net.py:582`)."""
    return input_lengths // config.input_to_prediction_length_ratio


# ---------------------------------------------------------------------------
# Transfer learning: cross-charset output-layer remap + freezing support
# (`/root/reference/speechless/net.py:184-269` semantics).
# ---------------------------------------------------------------------------

def character_remap_indices(source_characters: List[str],
                            target_characters: List[str]) -> List[Optional[int]]:
    """For each target character, the source index holding its filters (None if absent)."""
    source_index = {}
    for i, c in enumerate(source_characters):
        if c in source_index:
            raise ValueError("Duplicate character in source charset: {}".format(c))
        source_index[c] = i
    return [source_index.get(c) for c in target_characters]


def conv_flops_per_example(config: Wav2LetterConfig, input_frames: int,
                           train: bool = True) -> float:
    """Analytic conv FLOPs for one example (the MFU numerator; bias/activation and the
    feature frontend are excluded — convs dominate by >100x on this geometry).

    Forward: 2 * T_out * K * C_in * C_out per layer (multiply-add = 2 FLOPs).
    Training counts ~3x forward (input-gradient + weight-gradient convs each cost one
    forward's FLOPs — the standard conv fwd:bwd accounting)."""
    flops = 0.0
    frames = input_frames
    in_channels = config.input_size_per_time_step
    for spec in config.layers:
        frames = (frames + spec.stride - 1) // spec.stride  # SAME padding
        flops += 2.0 * frames * spec.kernel_size * in_channels * spec.filters
        in_channels = spec.filters
    return flops * (3.0 if train else 1.0)


# bf16 peak TFLOP/s per chip by device kind (public figures; the MFU denominator).
# NB v5e's oft-quoted 394 is the int8 TOPS number; bf16 peak is 197.
TPU_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def remap_output_layer(output_params: Dict[str, jnp.ndarray],
                       source_characters: List[str],
                       target_characters: List[str]) -> Dict[str, jnp.ndarray]:
    """Remap the final conv's per-grapheme filters between character sets.

    Characters present in both keep their filters; new characters get zero weights/bias;
    the CTC blank (last index on both sides) maps blank -> blank.
    """
    w = np.asarray(output_params["w"])  # (K, Cin, source_graphemes)
    b = np.asarray(output_params["b"])
    indices = character_remap_indices(source_characters, target_characters)
    target_size = len(target_characters) + 1  # + blank
    new_w = np.zeros(w.shape[:2] + (target_size,), dtype=w.dtype)
    new_b = np.zeros((target_size,), dtype=b.dtype)
    for target_idx, source_idx in enumerate(indices):
        if source_idx is not None:
            new_w[:, :, target_idx] = w[:, :, source_idx]
            new_b[target_idx] = b[source_idx]
    new_w[:, :, -1] = w[:, :, -1]  # blank -> blank
    new_b[-1] = b[-1]
    return {"w": jnp.asarray(new_w), "b": jnp.asarray(new_b)}


def trainable_mask(config: Wav2LetterConfig, frozen_layer_count: int) -> List[bool]:
    """Per-layer trainability flags: the first ``frozen_layer_count`` layers are frozen
    (`net.py:335-339`)."""
    return [i >= frozen_layer_count for i in range(len(config.layers))]
