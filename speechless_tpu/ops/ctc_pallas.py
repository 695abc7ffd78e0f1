"""Pallas TPU kernel for the CTC loss recursions.

Same contract as ``ctc.py`` (blank=last, -1-padded labels, masked variable lengths) but the
time recursions run as Pallas grid loops with the state vector resident in VMEM scratch:

* XLA precomputes emission log-probs E[t,b,s] as a one-hot MXU matmul (cheap) — the kernel
  is then a pure VPU streaming loop: per grid step one (B, S) tile of E is staged into VMEM
  by the Pallas pipeline while alpha/beta live in scratch across steps (TPU grids execute
  sequentially, so scratch carries state);
* lane shifts by 1/2 states use ``pltpu.roll`` + iota masks instead of concatenation;
* per-row variable lengths freeze each row's alpha at its last valid step, so the final
  log-prob is read from the last alpha slice outside the kernel — no per-row lane gather
  inside;
* backward runs the reversed grid via the BlockSpec index map and emits betas; the
  occupancy -> gradient contraction is a single batched matmul outside.

Measured vs the `lax.scan` implementation at (B=64, T'=512, U=192) on v5e: the scan spends
~60us/step on loop overhead; the kernel removes nearly all of it.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF, _all_emissions, _extended_labels, _logsumexp2, _logsumexp3

LANE = 128
SUBLANE = 8


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def _shift_lanes(x, amount):
    """Shift along the state (lane) axis so column s reads column s-amount; the first
    ``amount`` columns become NEG_INF."""
    rolled = pltpu.roll(x, shift=amount, axis=1)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(s_idx >= amount, rolled, NEG_INF)


def _alpha_kernel(lengths_ref, s_counts_ref, skip_ref, emit_ref, alpha_out_ref, alpha_scr):
    t = pl.program_id(0)
    emit = emit_ref[0]
    shape = emit.shape
    s_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    state_mask = s_idx < s_counts_ref[:]  # (B,1) broadcast over lanes

    @pl.when(t == 0)
    def _():
        alpha0 = jnp.where(s_idx < 2, emit, NEG_INF)
        alpha_scr[:] = jnp.where(state_mask, alpha0, NEG_INF)

    @pl.when(t > 0)
    def _():
        alpha = alpha_scr[:]
        advance = _shift_lanes(alpha, 1)
        skip = jnp.where(skip_ref[:] > 0, _shift_lanes(alpha, 2), NEG_INF)
        new_alpha = _logsumexp3(alpha, advance, skip) + emit
        new_alpha = jnp.where(state_mask, new_alpha, NEG_INF)
        active = t < lengths_ref[:]  # (B,1)
        alpha_scr[:] = jnp.where(active, new_alpha, alpha)

    alpha_out_ref[0] = alpha_scr[:]


def _beta_kernel(lengths_ref, s_counts_ref, skip_from_ref, terminal_ref, emit_next_ref,
                 beta_out_ref, beta_scr):
    reverse_t = pl.num_programs(0) - 1 - pl.program_id(0)
    emit_next = emit_next_ref[0]
    shape = emit_next.shape
    s_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    state_mask = s_idx < s_counts_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        beta_scr[:] = terminal_ref[:]

    scored = beta_scr[:] + emit_next
    # Reverse transitions: state s sums successors s, s+1, s+2 (skip gated at destination).
    # pltpu.roll only shifts right; a left shift by k is a right shift by S-k.
    max_s = shape[1]
    advance = pltpu.roll(scored, shift=max_s - 1, axis=1)
    advance = jnp.where(s_idx < max_s - 1, advance, NEG_INF)
    # skip_from is pre-shifted (skip_from[s] = skip_allowed[s+2]): mask after rolling.
    skip = pltpu.roll(scored, shift=max_s - 2, axis=1)
    skip = jnp.where((skip_from_ref[:] > 0) & (s_idx < max_s - 2), skip, NEG_INF)
    computed = _logsumexp3(scored, advance, skip)

    is_last_valid = reverse_t == lengths_ref[:] - 1  # (B,1)
    beta_t = jnp.where(is_last_valid, terminal_ref[:], computed)
    beta_t = jnp.where(state_mask, beta_t, NEG_INF)
    beta_scr[:] = beta_t
    beta_out_ref[0] = beta_t


def _pad_inputs(log_probs, labels):
    """Pad batch to a sublane multiple and the state dimension to a lane multiple."""
    batch, t_max, class_count = log_probs.shape
    label_max = labels.shape[1]
    s_count = 2 * label_max + 1
    padded_batch = _round_up(batch, SUBLANE)
    padded_s = _round_up(s_count, LANE)
    pad_labels = (padded_s - 1) // 2 + 1 - label_max  # so 2U'+1 >= padded_s
    return padded_batch, padded_s, pad_labels


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(log_probs, logit_lengths, labels, label_lengths, blank):
    """Drop-in replacement for ``ctc.ctc_loss`` backed by the Pallas kernels."""
    loss, _ = _forward_pallas(log_probs, logit_lengths, labels, label_lengths, blank)
    return loss


def _forward_pallas(log_probs, logit_lengths, labels, label_lengths, blank):
    batch, t_max, _ = log_probs.shape
    padded_batch, padded_s, label_pad = _pad_inputs(log_probs, labels)

    if padded_batch != batch:
        pad_rows = padded_batch - batch
        log_probs = jnp.pad(log_probs, ((0, pad_rows), (0, 0), (0, 0)))
        logit_lengths = jnp.pad(logit_lengths, (0, pad_rows), constant_values=1)
        labels = jnp.pad(labels, ((0, pad_rows), (0, 0)), constant_values=-1)
        label_lengths = jnp.pad(label_lengths, (0, pad_rows))
    if label_pad > 0:
        labels = jnp.pad(labels, ((0, 0), (0, label_pad)), constant_values=-1)

    extended, skip_allowed = _extended_labels(labels, blank)
    extended = extended[:, :padded_s]
    skip_allowed = skip_allowed[:, :padded_s]
    s_counts = (2 * label_lengths + 1).astype(jnp.int32)

    emissions = _all_emissions(log_probs, extended)  # (T, B', S')
    skip_f32 = skip_allowed.astype(jnp.float32)
    lengths_col = logit_lengths.astype(jnp.int32)[:, None]
    s_counts_col = s_counts[:, None]

    alphas = pl.pallas_call(
        _alpha_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((padded_batch, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded_batch, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded_batch, padded_s), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, padded_batch, padded_s), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, padded_batch, padded_s), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, padded_batch, padded_s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((padded_batch, padded_s), jnp.float32)],
        interpret=_interpret(),
    )(lengths_col, s_counts_col, skip_f32, emissions)

    # Rows freeze at t = length-1, so the last alpha slice holds each row's final state.
    final_alpha = alphas[-1]
    last = jnp.take_along_axis(final_alpha, s_counts_col - 1, axis=1)[:, 0]
    second = jnp.take_along_axis(final_alpha, jnp.maximum(s_counts_col - 2, 0), axis=1)[:, 0]
    second = jnp.where(s_counts >= 2, second, NEG_INF)
    final = _logsumexp2(last, second)
    loss = -final[:batch]

    residuals = (log_probs, logit_lengths, labels, label_lengths, extended, skip_allowed,
                 s_counts, emissions, alphas, final, batch)
    return loss, residuals


def _ctc_fwd(log_probs, logit_lengths, labels, label_lengths, blank):
    loss, residuals = _forward_pallas(log_probs, logit_lengths, labels, label_lengths, blank)
    return loss, residuals


def _ctc_bwd(blank, residuals, grad_out):
    (log_probs, logit_lengths, labels, label_lengths, extended, skip_allowed, s_counts,
     emissions, alphas, final, batch) = residuals
    padded_batch, t_max, class_count = (log_probs.shape[0], log_probs.shape[1],
                                        log_probs.shape[2])
    padded_s = extended.shape[1]
    s_range = jnp.arange(padded_s)[None, :]
    s_counts_col = s_counts[:, None]

    beta_terminal = jnp.where((s_range == s_counts_col - 1) |
                              (s_range == jnp.maximum(s_counts_col - 2, 0)), 0.0, NEG_INF)
    beta_terminal = jnp.where(s_range < s_counts_col, beta_terminal, NEG_INF)

    emissions_next = jnp.concatenate([emissions[1:], emissions[-1:]], axis=0)
    skip_from = jnp.concatenate(
        [skip_allowed[:, 2:], jnp.zeros((padded_batch, 2), dtype=bool)],
        axis=1).astype(jnp.float32)
    lengths_col = logit_lengths.astype(jnp.int32)[:, None]

    betas = pl.pallas_call(
        _beta_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((padded_batch, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded_batch, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded_batch, padded_s), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((padded_batch, padded_s), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            # Reverse streaming: grid step i reads/writes time T-1-i.
            pl.BlockSpec((1, padded_batch, padded_s), lambda t, n=t_max: (n - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, padded_batch, padded_s),
                               lambda t, n=t_max: (n - 1 - t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, padded_batch, padded_s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((padded_batch, padded_s), jnp.float32)],
        interpret=_interpret(),
    )(lengths_col, s_counts_col, skip_from, beta_terminal, emissions_next)

    one_hot = jax.nn.one_hot(extended, class_count, dtype=log_probs.dtype)
    gamma = alphas + betas - final[None, :, None]
    gamma = jnp.where(s_range[None] < s_counts[None, :, None], gamma, NEG_INF)
    occupancy = jnp.einsum("tbs,bsc->btc", jnp.exp(gamma), one_hot)
    valid = (jnp.arange(t_max)[None, :] < logit_lengths[:, None])[:, :, None]
    grads = jnp.where(valid, -occupancy, 0.0)
    grads = grads[:batch] * grad_out[:, None, None]
    return (grads, None, None, None)


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_from_logits_pallas(logits, logit_lengths, labels, label_lengths, blank):
    return ctc_loss_pallas(jax.nn.log_softmax(logits, axis=-1), logit_lengths, labels,
                           label_lengths, blank)


def ctc_loss_from_logits_pallas_sharded(logits, logit_lengths, labels, label_lengths,
                                        blank, data_axis: str = "data"):
    """The Pallas CTC loss under a `(data, model)` mesh: per-example CTC is batch-
    independent, so each data shard runs the kernel on its local rows via `jax.shard_map`
    (a `pallas_call` cannot be auto-partitioned by GSPMD; without this wrapper meshed
    training had to fall back to the `lax.scan` recursion). Call inside `jax.set_mesh`;
    the batch dimension must be sharded over ``data_axis``."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    spec = P(data_axis)
    return jax.shard_map(
        partial(ctc_loss_from_logits_pallas, blank=blank),
        in_specs=(spec, spec, spec, spec), out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(logits, logit_lengths, labels, label_lengths)
