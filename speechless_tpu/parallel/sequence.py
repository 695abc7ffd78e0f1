"""Sequence parallelism: the TIME axis sharded over the mesh for long-form inference.

The reference transcribes long recordings by segmenting on host-detected silence and
feeding segments one by one (our serving path keeps that mode). TPU-natively there is a
second option the reference cannot express: shard the *time* axis of one very long
utterance over the device mesh, exchange conv halos over ICI, and run the whole acoustic
forward as ONE SPMD program — an hour of audio (~1.1 M mel frames) becomes ~140 k frames
per chip on an 8-chip slice, each chip's convs stay MXU-shaped, and the only
communication is a halo of a few hundred frames per boundary (micro-seconds on ICI).

Exactness, not approximation: wav2letter is a pure conv stack (models/wav2letter.py), so
an output frame depends on at most `receptive_field_inputs()` input frames. Each shard
computes on [chunk + 2·halo] frames — its own chunk plus halos ppermute'd from its
neighbors — and keeps only the central `chunk / stride_ratio` output frames, which are
bit-identical to the unsharded forward:

* chunk and halo are multiples of the total stride ratio, so every layer sees locally a
  stride-phase-aligned window and XLA's (even-kernel, asymmetric) SAME pad counts match
  the global ones — interior outputs are pure translations of global outputs;
* the global boundary is NOT equivalent to a zero halo (SAME re-pads zeros at EVERY
  layer, while a zero input halo turns into `activation(bias)` after the first conv), so
  the first/last shards roll their extended window by ±halo to put the global edge at
  the LOCAL array edge — local SAME padding then coincides with global SAME padding at
  every layer — and slice their outputs at an `axis_index`-dependent offset. One uniform
  SPMD program covers edge and interior shards.

Parity is pinned in tests/test_sequence_parallel.py on an 8-device mesh, including the
raw-wave frontend (stride 320). Reference anchor: long recordings path
`/root/reference/speechless/recording.py` + `net.py:453-468` (segment-by-silence only).
"""
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import wav2letter as w2l
from .mesh import DATA_AXIS


def receptive_field_inputs(config: w2l.Wav2LetterConfig) -> int:
    """Receptive field of one output frame, in input frames (mel frames or samples)."""
    field = 1
    for spec in reversed(config.layers):
        field = (field - 1) * spec.stride + spec.kernel_size
    return field


def halo_output_frames(config: w2l.Wav2LetterConfig) -> int:
    """Conservative per-side halo, in OUTPUT frames: the full receptive field rounded up
    to whole output frames (contamination from a shard edge decays within half of this;
    using the full field keeps the bound obviously safe — halos are cheap)."""
    ratio = config.input_to_prediction_length_ratio
    return -(-receptive_field_inputs(config) // ratio)


def sequence_parallel_logits(config: w2l.Wav2LetterConfig, params: w2l.Params,
                             inputs: jnp.ndarray, mesh: Mesh,
                             axis: str = DATA_AXIS,
                             halo_outputs: Optional[int] = None) -> jnp.ndarray:
    """Time-sharded acoustic forward: ``(B, T, F) -> (B, ceil(T / n·ratio)·n, C)`` f32
    logits, input and output both sharded ``P(None, axis, None)`` over the mesh.

    T is zero-padded up to a per-shard multiple of the stride ratio (zero padding
    coincides with SAME semantics, so frames below ``T // ratio`` are unaffected);
    callers slice the valid prefix with `prediction_lengths`. Works under `jax.jit`
    (shard_map composes), and for ``n = 1`` degenerates to the plain forward.
    """
    n = mesh.shape[axis]
    ratio = config.input_to_prediction_length_ratio
    if halo_outputs is None:
        halo_outputs = halo_output_frames(config)
    halo = halo_outputs * ratio
    batch, frames, features = inputs.shape
    chunk = -(-frames // (n * ratio)) * ratio
    padded = jnp.pad(inputs, ((0, 0), (0, chunk * n - frames), (0, 0)))
    if n == 1 or chunk < halo:
        # Shards shorter than the halo would need multi-hop exchange; long-form input is
        # the whole point of this path, so just run unsharded.
        return w2l.apply(config, params, padded)

    forward = [(i, i + 1) for i in range(n - 1)]   # my tail -> right neighbor's left halo
    backward = [(i + 1, i) for i in range(n - 1)]  # my head -> left neighbor's right halo

    def shard_forward(local_params, local):
        left = jax.lax.ppermute(local[:, -halo:], axis, forward)
        right = jax.lax.ppermute(local[:, :halo], axis, backward)
        extended = jnp.concatenate([left, local, right], axis=1)
        # Edge shards: roll the window so the GLOBAL boundary lands on the LOCAL array
        # edge (their ppermute'd halo is zeros anyway); every layer's local SAME pad
        # then equals the global one, making the global-edge outputs exact too.
        index = jax.lax.axis_index(axis)
        shift = jnp.where(index == 0, -halo, jnp.where(index == n - 1, halo, 0))
        extended = jnp.roll(extended, shift, axis=1)
        logits = w2l.apply(config, local_params, extended)
        offset = halo_outputs + shift // ratio
        return jax.lax.dynamic_slice_in_dim(logits, offset, chunk // ratio, axis=1)

    spec = P(None, axis, None)
    sharded = jax.shard_map(shard_forward, mesh=mesh,
                            in_specs=(jax.tree.map(lambda _: P(), params), spec),
                            out_specs=spec)
    return sharded(params, padded)


def sequence_parallel_log_probs(config: w2l.Wav2LetterConfig, params: w2l.Params,
                                inputs: jnp.ndarray, mesh: Mesh,
                                axis: str = DATA_AXIS,
                                halo_outputs: Optional[int] = None) -> jnp.ndarray:
    """Log-softmax posteriors from the time-sharded forward (decoder-ready; the
    posterior array is ~4 orders of magnitude smaller than the audio, so decode
    composes with any of ops/decode*)."""
    logits = sequence_parallel_logits(config, params, inputs, mesh, axis=axis,
                                      halo_outputs=halo_outputs)
    return jax.nn.log_softmax(logits, axis=-1)


def place_time_sharded(mesh: Mesh, inputs, axis: str = DATA_AXIS):
    """Device-put a (B, T, F) array sharded over its time axis (the intended feed for
    `sequence_parallel_logits`; keeps per-chip HBM at T/n)."""
    return jax.device_put(inputs, NamedSharding(mesh, P(None, axis, None)))
