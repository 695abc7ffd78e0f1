"""Pallas TPU kernel for batched CTC prefix beam search (no LM).

The XLA beam (`decode_jax.py`) is a `lax.scan` of many small sort/scatter ops per frame
under `vmap`; on TPU each frame costs ~1.8 ms for a 64-utterance batch because the tiny
(W·(k+1),) merge tensors are HBM-bound and `vmap` forbids per-utterance control flow.
This kernel runs one utterance per grid cell with ALL beam state resident in VMEM:

* candidates live in a single-row ``(1, n)`` layout (n = pow2(W_pad·(k+1)), parent-major);
  the bitonic compare-exchange partner ``i XOR s`` is realized as `pltpu.roll`s + an iota
  select, so the whole sort is static vector ops — no gathers, no scatters;
* prefix merging = sort by rolling hash + segmented log-sum-exp, computed with
  Hillis–Steele shift stages (again rolls + masks);
* every per-beam attribute (last char, prefix length, backpointer) rides through the
  sorts as a payload vector, and all per-frame scalars (top-k scores/chars, the full
  frame for repeat/blank mass) are packed into one 128-lane row per frame and extracted
  with iota-select reductions — no dynamic indexing anywhere;
* per-frame class pruning (top-k) is precomputed by XLA outside (one big `top_k`);
* frames whose blank log-prob exceeds ``skip_blank_log_prob`` take a 3-op fast path
  (the prefix set is unchanged up to the pruning floor) — per-utterance control flow the
  vmapped XLA version fundamentally cannot express (a batched `lax.cond` runs both
  branches).

Outputs the same (backpointers, final masses) contract as the XLA beam; the winning
prefix is reconstructed by the shared backtrace. Token-parity with
`decode_jax.beam_search_decode_jax` (no LM) is pinned in tests; the "AA<blank>AA" -> "AA"
contract (reference `test_ctc_decoders.py`) holds by construction.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
HASH_MULTIPLIER = 16777619    # FNV-ish; int32 wraparound == uint32 bits
EMPTY_HASH = -2128831035      # 0x811C9DC5 as int32
DEAD_KEY = 2147483647
FRAME_LANES = 128
TIME_BLOCK = 8


def _next_pow2(value: int) -> int:
    return 1 << max(0, (value - 1)).bit_length()


def _lane_roll(x, shift):
    """Cyclic roll along lanes (`pltpu.roll` wants shift >= 0)."""
    return pltpu.roll(x, shift=shift % x.shape[1], axis=1)


def _sub_roll(x, shift):
    """Cyclic roll along sublanes."""
    if x.shape[0] == 1:
        return x
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _flat_iota(shape):
    """Row-major flat index i = row * L + col for an (R2, L) layout."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * shape[1] + col


def _xor_partner(x, stride):
    """y[i] = x[i XOR stride] over the row-major flat index of an (R2, L) array
    (R2, L, and stride all powers of two; the flat length R2*L is the sort size).

    stride < L flips a column bit (lane rolls); stride >= L flips a row bit (sublane
    rolls). Lanes whose stride bit is 0 read partner i+stride, the rest i-stride;
    every selected element is in range by construction."""
    r2, lanes = x.shape
    if stride < lanes:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        bit_zero = (col & stride) == 0
        return jnp.where(bit_zero, _lane_roll(x, -stride), _lane_roll(x, stride))
    row_stride = stride // lanes
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    bit_zero = (row & row_stride) == 0
    return jnp.where(bit_zero, _sub_roll(x, -row_stride), _sub_roll(x, row_stride))


def _shift_right(x, shift, fill):
    """y[i] = x[i - shift] over the flat index (y[:shift] = fill); shift < L."""
    lanes = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = _lane_roll(x, shift)
    carried = _sub_roll(rolled, 1)            # wrapped columns read the previous row
    y = jnp.where(col >= shift, rolled, carried)
    return jnp.where(_flat_iota(x.shape) >= shift, y, fill)


def _shift_left(x, shift, fill):
    """y[i] = x[i + shift] over the flat index (y[n-shift:] = fill); shift a power of
    two <= flat length / 2."""
    r2, lanes = x.shape
    n = r2 * lanes
    if shift < lanes:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        rolled = _lane_roll(x, -shift)
        carried = _sub_roll(rolled, -1)       # wrapped columns read the next row
        y = jnp.where(col < lanes - shift, rolled, carried)
    else:
        y = _sub_roll(x, -(shift // lanes))
    return jnp.where(_flat_iota(x.shape) < n - shift, y, fill)


def _lane_value(row, lane_index, fill):
    """Extract lane ``lane_index`` (static) of a (1, L) row as a (1, 1) splat-able."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.max(jnp.where(lanes == lane_index, row, fill), axis=1, keepdims=True)


def _bitonic_sort(keys, payloads, secondary=None):
    """In-register bitonic sort (ascending by ``keys``, then ``secondary``) of a (1, n)
    row; payloads are permuted identically. Returns (keys, secondary, payloads).

    Each compare-exchange stage is one XOR-partner shuffle + selects: a pair's lower
    lane (stride bit 0) must end up with the pair minimum in an ascending subsequence.
    Subsequence direction for merge stage k alternates with bit k of the lane index
    (bit log2(n) is always 0, so the final merge is globally ascending)."""
    n = keys.shape[0] * keys.shape[1]
    stages = int(math.log2(n))
    flat = _flat_iota(keys.shape)
    for k in range(1, stages + 1):
        ascending = (flat & (1 << k)) == 0
        for j in range(k - 1, -1, -1):
            stride = 1 << j
            upper = (flat & stride) != 0  # this slot holds the pair's upper element
            partner_key = _xor_partner(keys, stride)
            greater = keys > partner_key
            less = keys < partner_key
            if secondary is not None:
                partner_secondary = _xor_partner(secondary, stride)
                equal = keys == partner_key
                greater = greater | (equal & (secondary > partner_secondary))
                less = less | (equal & (secondary < partner_secondary))
            # Ascending pair: lower lane wants the min (swap if own > partner), upper
            # lane wants the max (swap if own < partner). Descending: mirrored.
            # Boolean algebra, not jnp.where: Mosaic cannot select between i1 vectors.
            take_asc = (upper & less) | (~upper & greater)
            take_desc = (upper & greater) | (~upper & less)
            take_partner = (ascending & take_asc) | (~ascending & take_desc)
            keys = jnp.where(take_partner, partner_key, keys)
            if secondary is not None:
                secondary = jnp.where(take_partner, partner_secondary, secondary)
            payloads = [jnp.where(take_partner, _xor_partner(p, stride), p)
                        for p in payloads]
    return keys, secondary, payloads


def _segmented_merge(keys, pb, pnb, idx, rider=None):
    """Group equal adjacent keys (sorted (1, n) row): per-segment log-sum-exp of pb/pnb
    and min of idx, placed at every member (so each run-start holds its totals).

    ``rider`` (optional f32): propagated alongside ``idx`` so each slot ends up holding
    the rider value of its segment's min-idx member (the same representative the XLA
    beam's ``seg_repr`` picks) — used for the per-prefix LM score, where all merge
    sources agree semantically but bit-exact parity needs the representative's value."""
    n = keys.shape[0] * keys.shape[1]
    run_start = (_flat_iota(keys.shape) == 0) | (keys != _shift_right(keys, 1, DEAD_KEY))
    # Backward-inclusive segmented scan: absorb from the right while no run start is
    # crossed. `blocked` marks that a boundary lies within the current absorb window.
    # (Flags ride as int32: Mosaic cannot roll i1 vectors.)
    blocked = _shift_left(run_start.astype(jnp.int32), 1, 1)
    stages = int(math.log2(n))
    for s in [1 << j for j in range(stages)]:
        pb_r = _shift_left(pb, s, NEG_INF)
        pnb_r = _shift_left(pnb, s, NEG_INF)
        idx_r = _shift_left(idx, s, jnp.int32(2 ** 31 - 1))
        blocked_r = _shift_left(blocked, s, 1)
        open_window = blocked == 0
        pb = jnp.where(open_window, jnp.logaddexp(pb, pb_r), pb)
        pnb = jnp.where(open_window, jnp.logaddexp(pnb, pnb_r), pnb)
        if rider is not None:
            rider_r = _shift_left(rider, s, 0.0)
            take_right = open_window & (idx_r < idx)
            rider = jnp.where(take_right, rider_r, rider)
        idx = jnp.where(open_window, jnp.minimum(idx, idx_r), idx)
        blocked = blocked | blocked_r
    if rider is not None:
        return run_start, pb, pnb, idx, rider
    return run_start, pb, pnb, idx


def _beam_kernel(length_ref, frame_ref,
                 parents_ref, chars_ref, pb_ref, pnb_ref, len_ref,
                 pb_s, pnb_s, hash_s, last_s, len_s, bp_parent_s, bp_char_s,
                 parents_acc, chars_acc,
                 *, beam_width, r_pad, ext_count, n_pad, rows2, class_count, blank,
                 max_decoded_length, skip_blank_log_prob):
    b = pl.program_id(0)
    tb = pl.program_id(1)
    r = r_pad
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)

    @pl.when(tb == 0)
    def _():
        live0 = lane_r == 0
        pb_s[:] = jnp.where(live0, 0.0, NEG_INF)
        pnb_s[:] = jnp.full((1, r), NEG_INF)
        hash_s[:] = jnp.where(live0, EMPTY_HASH, 0)
        last_s[:] = jnp.full((1, r), -1, jnp.int32)
        len_s[:] = jnp.zeros((1, r), jnp.int32)

    length = length_ref[b, 0]
    block8 = frame_ref[0, 0]

    def frame_body(i, carry):
        t = tb * TIME_BLOCK + i
        active = t < length
        # This frame's packed row: lanes [0:k] top-k scores, [k:2k] top-k chars (as
        # f32), [2k:2k+C] the full log-prob frame. The (TIME_BLOCK, 128) block covers
        # TIME_BLOCK frames; select row i with a masked sum (exactly one row live).
        row_sel = jax.lax.broadcasted_iota(jnp.int32, block8.shape, 0) == i
        frame_row = jnp.sum(jnp.where(row_sel, block8, 0.0), axis=0, keepdims=True)

        lp_blank = _lane_value(frame_row, 2 * ext_count + blank, NEG_INF)  # (1, 1)
        blank_dominates = (skip_blank_log_prob is not None) \
            and (lp_blank[0, 0] > skip_blank_log_prob)
        if skip_blank_log_prob is None:
            blank_dominates = jnp.full((), False)

        pb = pb_s[:]
        pnb = pnb_s[:]
        total = jnp.logaddexp(pb, pnb)
        valid = total > NEG_INF / 2
        # lp[last_char] per beam, unrolled over the (static) alphabet.
        lp_last = jnp.full((1, r), NEG_INF)
        for c in range(class_count):
            value = _lane_value(frame_row, 2 * ext_count + c, NEG_INF)
            lp_last = jnp.where(last_s[:] == c, value, lp_last)

        @pl.when(active & blank_dominates)
        def _():
            # Blank-dominated frame: the prefix set (and its ranking, up to the
            # pruning floor) is unchanged — only the blank/non-blank split updates.
            pb_s[:] = jnp.where(valid, total + lp_blank, NEG_INF)
            pnb_s[:] = jnp.where(valid & (last_s[:] >= 0), pnb + lp_last, NEG_INF)

        # Defaults (inactive / fast-path): every beam is its own parent, no emission.
        bp_parent_s[:] = lane_r
        bp_char_s[:] = jnp.full((1, r), -1, jnp.int32)

        _full_update(active & ~blank_dominates, pb, pnb, total, valid, lp_blank,
                     lp_last, frame_row)

        # Accumulate this frame's backpointer row.
        row_mask = jax.lax.broadcasted_iota(jnp.int32, (TIME_BLOCK, r), 0) == i
        parents_acc[:] = jnp.where(
            row_mask, jnp.broadcast_to(bp_parent_s[:], (TIME_BLOCK, r)), parents_acc[:])
        chars_acc[:] = jnp.where(
            row_mask, jnp.broadcast_to(bp_char_s[:], (TIME_BLOCK, r)), chars_acc[:])
        return carry

    def _full_update(pred, pb, pnb, total, valid, lp_blank, lp_last, frame_row):
        @pl.when(pred)
        def _():
            # Dense candidate layout: (rows2, cols2) with rows2*cols2 = n_pad uses the
            # sublane dimension (8x fewer vector instructions than a single row); the
            # parent-beam mapping w = flat % r depends only on the column, so state
            # expansion stays a static tile + row broadcast.
            cols2 = n_pad // rows2
            shape2 = (rows2, cols2)
            flat_n = _flat_iota(shape2)
            w_of = flat_n % r                      # candidate's parent beam
            e_of = flat_n // r                     # 0 = stay, 1..ext_count = extensions
            live_cand = e_of <= ext_count

            def expand(state_row, fill):
                tiled = jnp.concatenate([state_row] * (cols2 // r), axis=1)
                tiled = jnp.broadcast_to(tiled, shape2)
                return jnp.where(live_cand, tiled, fill)

            c_pb = expand(pb, NEG_INF)
            c_pnb = expand(pnb, NEG_INF)
            c_total = expand(total, NEG_INF)
            c_valid = expand(valid.astype(jnp.int32), 0) > 0
            c_hash = expand(hash_s[:], 0)
            c_last = expand(last_s[:], -1)
            c_len = expand(len_s[:], 0)
            c_lplast = expand(lp_last, NEG_INF)

            # Per-extension-slot frame data, unrolled over the static slot count.
            ext_score = jnp.full(shape2, NEG_INF)
            ext_char = jnp.full(shape2, -1, jnp.int32)
            for e in range(ext_count):
                in_slot = e_of == (e + 1)
                score_e = _lane_value(frame_row, e, NEG_INF)
                char_e = _lane_value(frame_row, ext_count + e, -1.0).astype(jnp.int32)
                ext_score = jnp.where(in_slot, score_e, ext_score)
                ext_char = jnp.where(in_slot, char_e, ext_char)

            is_stay = e_of == 0
            # Stay candidate: blank mass + repeat-last-char mass.
            stay_pb = jnp.where(c_valid, c_total + lp_blank, NEG_INF)
            stay_pnb = jnp.where(c_valid & (c_last >= 0), c_pnb + c_lplast, NEG_INF)
            # Extension candidate: non-blank class, capacity-checked.
            ext_base = jnp.where(ext_char == c_last, c_pb, c_total)
            ext_ok = c_valid & (ext_char >= 0) & (ext_char != blank) \
                & (c_len < max_decoded_length)
            ext_pnb = jnp.where(ext_ok, ext_base + ext_score, NEG_INF)

            cand_pb = jnp.where(is_stay, stay_pb, NEG_INF)
            cand_pnb = jnp.where(is_stay, stay_pnb, ext_pnb)
            cand_hash = jnp.where(is_stay, c_hash,
                                  c_hash * HASH_MULTIPLIER + (ext_char + 2))
            cand_last = jnp.where(is_stay, c_last, ext_char)
            cand_len = jnp.where(is_stay, c_len,
                                 jnp.minimum(c_len + 1, max_decoded_length))
            alive = jnp.logaddexp(cand_pb, cand_pnb) > NEG_INF / 2
            key = jnp.where(alive, cand_hash, DEAD_KEY)
            # Original candidate index (for min-representative tie-breaks): parent-major.
            orig = jnp.where(alive, w_of * (ext_count + 1) + e_of, jnp.int32(2 ** 31 - 1))

            key, _, payloads = _bitonic_sort(
                key, [cand_pb, cand_pnb, orig, cand_last, cand_len])
            s_pb, s_pnb, s_orig, s_last, s_len = payloads
            run_start, m_pb, m_pnb, m_idx = _segmented_merge(key, s_pb, s_pnb, s_orig)

            # Only the run-start slot may represent a merged prefix: non-start
            # duplicates still carry finite PARTIAL masses from the backward scan, and
            # the in_beam check below tests mass (not score) — without this mask a
            # duplicate copy of a live prefix enters the beam whenever distinct live
            # prefixes < beam_width (e.g. early frames at large W), double-counting
            # its mass at the next frame's merge.
            m_pb = jnp.where(run_start, m_pb, NEG_INF)
            m_pnb = jnp.where(run_start, m_pnb, NEG_INF)
            score = jnp.where(run_start & (key != DEAD_KEY),
                              jnp.logaddexp(m_pb, m_pnb), NEG_INF)
            _, _, payloads2 = _bitonic_sort(
                -score, [m_pb, m_pnb, key, m_idx, s_last, s_len], secondary=m_idx)
            # Top candidates = the first r flat slots = row 0's first r columns.
            f_pb, f_pnb, f_key, f_idx, f_last, f_len = [p[0:1, :r] for p in payloads2]

            in_beam = (lane_r < beam_width) & (jnp.logaddexp(f_pb, f_pnb) > NEG_INF / 2)
            pb_s[:] = jnp.where(in_beam, f_pb, NEG_INF)
            pnb_s[:] = jnp.where(in_beam, f_pnb, NEG_INF)
            hash_s[:] = jnp.where(in_beam, f_key, 0)
            last_s[:] = jnp.where(in_beam, f_last, -1)
            len_s[:] = jnp.where(in_beam, f_len, 0)
            # Backpointers: parent = candidate index // (ext_count+1); char on extensions.
            emitted = in_beam & ((f_idx % (ext_count + 1)) > 0)
            bp_parent_s[:] = jnp.where(in_beam, f_idx // (ext_count + 1), lane_r)
            bp_char_s[:] = jnp.where(emitted, f_last, -1)

    jax.lax.fori_loop(0, TIME_BLOCK, frame_body, 0, unroll=False)

    parents_ref[0, 0] = parents_acc[:]
    chars_ref[0, 0] = chars_acc[:]
    pb_ref[0, 0, :] = pb_s[0]
    pnb_ref[0, 0, :] = pnb_s[0]
    len_ref[0, 0, :] = len_s[0]


@functools.partial(jax.jit, static_argnames=("blank", "beam_width",
                                             "max_decoded_length", "prune_classes",
                                             "skip_blank_log_prob", "dense_layout"))
def beam_search_decode_pallas(log_probs, lengths, blank, beam_width=25,
                              max_decoded_length=256, prune_classes=8,
                              skip_blank_log_prob=None, dense_layout=None):
    """Batched on-device prefix beam search as a Pallas kernel (no LM fusion).

    Same contract as `decode_jax.beam_search_decode_jax(..., prune_classes=k)`:
    returns ``(tokens (B, max_decoded_length) int32 -1-padded, counts (B,))``.

    ``skip_blank_log_prob``: optional fast-path threshold (e.g. ``math.log(0.999)``) —
    frames whose blank log-prob exceeds it update only the blank/non-blank mass split.
    Output-identical to the full update whenever the frame's non-blank mass is below
    the pruning floor; None disables it (exact parity with the XLA beam)."""
    batch, t_max, class_count = log_probs.shape
    if class_count + 2 * prune_classes > FRAME_LANES:
        raise ValueError("alphabet too large for the packed frame row")
    k = min(prune_classes, class_count)
    r_pad = _next_pow2(max(beam_width, 8))
    n_pad = _next_pow2((k + 1) * r_pad)
    # Candidate layout: single-row (1, n) is the measured winner on v5e — the (8, n/8)
    # dense layout halves throughput (754 ms vs 393 ms at B=64/T'=512/W=25) because
    # Mosaic's cross-sublane rotates cost more than the lane-width packing saves.
    # The dense path stays available (and parity-tested) for future Mosaic tuning.
    if dense_layout is None:
        dense_layout = False
    rows2 = 8 if (dense_layout and n_pad >= 8 * r_pad and n_pad // 8 >= r_pad) else 1
    t_pad = ((t_max + TIME_BLOCK - 1) // TIME_BLOCK) * TIME_BLOCK
    blocks = t_pad // TIME_BLOCK

    log_probs = log_probs.astype(jnp.float32)
    frame_scores, frame_chars = jax.lax.top_k(log_probs, k)  # (B, T, k)
    # Packed per-frame row: [0:k] scores, [k:2k] chars (f32), [2k:2k+C] full frame.
    packed = jnp.concatenate(
        [frame_scores, frame_chars.astype(jnp.float32), log_probs,
         jnp.full((batch, t_max, FRAME_LANES - class_count - 2 * k), NEG_INF)], axis=2)
    packed = jnp.pad(packed, ((0, 0), (0, t_pad - t_max), (0, 0)),
                     constant_values=NEG_INF)
    packed = packed.reshape(batch, blocks, TIME_BLOCK, FRAME_LANES)

    kernel = functools.partial(
        _beam_kernel, beam_width=beam_width, r_pad=r_pad, ext_count=k, n_pad=n_pad,
        rows2=rows2, class_count=class_count, blank=blank,
        max_decoded_length=max_decoded_length,
        skip_blank_log_prob=skip_blank_log_prob)

    parents, chars, pb, pnb, lens = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda b, tb: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TIME_BLOCK, FRAME_LANES),
                         lambda b, tb: (b, tb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TIME_BLOCK, r_pad), lambda b, tb: (b, tb, 0, 0)),
            pl.BlockSpec((1, 1, TIME_BLOCK, r_pad), lambda b, tb: (b, tb, 0, 0)),
            pl.BlockSpec((1, 1, r_pad), lambda b, tb: (b, 0, 0)),
            pl.BlockSpec((1, 1, r_pad), lambda b, tb: (b, 0, 0)),
            pl.BlockSpec((1, 1, r_pad), lambda b, tb: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, blocks, TIME_BLOCK, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((batch, blocks, TIME_BLOCK, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, r_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, r_pad), jnp.float32),
            pltpu.VMEM((1, r_pad), jnp.float32),
            pltpu.VMEM((1, r_pad), jnp.int32),
            pltpu.VMEM((1, r_pad), jnp.int32),
            pltpu.VMEM((1, r_pad), jnp.int32),
            pltpu.VMEM((1, r_pad), jnp.int32),
            pltpu.VMEM((1, r_pad), jnp.int32),
            pltpu.VMEM((TIME_BLOCK, r_pad), jnp.int32),
            pltpu.VMEM((TIME_BLOCK, r_pad), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(lengths.astype(jnp.int32).reshape(-1, 1), packed)

    parents = parents.reshape(batch, t_pad, r_pad)[:, :t_max]
    chars = chars.reshape(batch, t_pad, r_pad)[:, :t_max]
    pb, pnb, lens = pb[:, 0], pnb[:, 0], lens[:, 0]

    # Winner + backtrace (the shared reconstruction in decode_jax.backtrace_tokens).
    from .decode_jax import backtrace_tokens

    final = jnp.logaddexp(pb, pnb)
    best = jnp.argmax(final, axis=1)
    tokens, counts = jax.vmap(
        lambda parents_b, chars_b, best_b, lens_b: backtrace_tokens(
            parents_b, chars_b, best_b, lens_b[best_b], max_decoded_length)
    )(parents, chars, best, lens)
    return tokens, counts.astype(jnp.int32)
