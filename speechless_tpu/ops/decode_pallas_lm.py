"""Word-LM-fused CTC prefix beam search: Pallas merge kernel + XLA LM gathers.

The reference's flagship decode runs word-level KenLM fusion inside the beam
(`/root/reference/speechless/net.py:444-451`). Round 2 left the device LM beam on the
slow XLA path (every frame is ~20 small sort/scatter ops per utterance under `vmap`)
because the Pallas kernel cannot express the LM: the trie walk and the hashed n-gram
probes (`lm/device_lm.py`) are data-dependent vector gathers, which Mosaic does not
vectorize. This module splits the frame step at exactly that line:

* a **Pallas beam-step kernel** does the expensive part — candidate expansion, the
  bitonic merge-by-prefix-hash, and top-W selection — with a layout twist over the
  no-LM kernel (`decode_pallas.py`): the step is one frame, so the time loop moves to
  a `lax.scan` OUTSIDE the kernel, and the kernel batches **8 utterances across
  sublanes**. Every roll/select in the sort network is lane-only (rows are independent
  utterances), so the VPU runs 8 beams' sorts per instruction where the no-LM kernel's
  single-row layout used 1 of 8 sublanes;
* **XLA ops between frames** do what it does well — the per-beam word-trie walk, the
  open-addressing n-gram probes, and the boundary-bonus arithmetic are a handful of
  vectorized gathers over (batch, W) registers (microseconds per frame on TPU).

Beam state rides through HBM between the kernel and the gathers ((B, W) rows, ~100 KB
per frame — negligible against the sort work). The per-prefix LM score joins the
in-kernel ranking as a sort payload, propagated through the segmented merge at the
min-index representative so the selected value is bit-identical to the XLA beam's
`all_lm[seg_repr]`. Token parity with `decode_jax.beam_search_decode_jax(word_lm=...)`
is pinned in tests; weights are the reference's `lm_weight`/`word_count_weight`/
`valid_word_count_weight` (`net.py:449-451`).
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_pallas import (DEAD_KEY, EMPTY_HASH, FRAME_LANES, HASH_MULTIPLIER,
                            NEG_INF, _next_pow2)

SUBLANES = 8  # utterances per grid cell (rows are independent: lane-only sort network)


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_roll(x, shift):
    return pltpu.roll(x, shift=shift % x.shape[1], axis=1)


def _row_xor_partner(x, stride):
    """y[s, i] = x[s, i XOR stride] per row (stride a power of two < lanes)."""
    bit_zero = (_col_iota(x.shape) & stride) == 0
    return jnp.where(bit_zero, _row_roll(x, -stride), _row_roll(x, stride))


def _row_shift_right(x, shift, fill):
    """y[s, i] = x[s, i - shift] per row (y[:, :shift] = fill)."""
    return jnp.where(_col_iota(x.shape) >= shift, _row_roll(x, shift), fill)


def _row_shift_left(x, shift, fill):
    """y[s, i] = x[s, i + shift] per row (y[:, -shift:] = fill)."""
    return jnp.where(_col_iota(x.shape) < x.shape[1] - shift, _row_roll(x, -shift), fill)


def _row_lane_value(row, lane_index, fill):
    """Per-row extraction of lane ``lane_index`` (static): (S, L) -> (S, 1)."""
    return jnp.max(jnp.where(_col_iota(row.shape) == lane_index, row, fill),
                   axis=1, keepdims=True)


def _row_bitonic_sort(keys, payloads, secondary=None):
    """Row-independent bitonic sort (ascending by ``keys`` then ``secondary``) of an
    (S, n) block; payloads are permuted identically. See `decode_pallas._bitonic_sort`
    for the compare-exchange derivation — here every stage is a lane roll."""
    n = keys.shape[1]
    col = _col_iota(keys.shape)
    for k in range(1, int(math.log2(n)) + 1):
        ascending = (col & (1 << k)) == 0
        for j in range(k - 1, -1, -1):
            stride = 1 << j
            upper = (col & stride) != 0
            partner_key = _row_xor_partner(keys, stride)
            greater = keys > partner_key
            less = keys < partner_key
            if secondary is not None:
                partner_secondary = _row_xor_partner(secondary, stride)
                equal = keys == partner_key
                greater = greater | (equal & (secondary > partner_secondary))
                less = less | (equal & (secondary < partner_secondary))
            take_asc = (upper & less) | (~upper & greater)
            take_desc = (upper & greater) | (~upper & less)
            take_partner = (ascending & take_asc) | (~ascending & take_desc)
            keys = jnp.where(take_partner, partner_key, keys)
            if secondary is not None:
                secondary = jnp.where(take_partner, partner_secondary, secondary)
            payloads = [jnp.where(take_partner, _row_xor_partner(p, stride), p)
                        for p in payloads]
    return keys, secondary, payloads


def _row_segmented_merge(keys, pb, pnb, idx, rider):
    """Row-independent analog of `decode_pallas._segmented_merge` (+min-idx rider)."""
    n = keys.shape[1]
    run_start = (_col_iota(keys.shape) == 0) \
        | (keys != _row_shift_right(keys, 1, DEAD_KEY))
    blocked = _row_shift_left(run_start.astype(jnp.int32), 1, 1)
    for s in [1 << j for j in range(int(math.log2(n)))]:
        pb_r = _row_shift_left(pb, s, NEG_INF)
        pnb_r = _row_shift_left(pnb, s, NEG_INF)
        idx_r = _row_shift_left(idx, s, jnp.int32(2 ** 31 - 1))
        rider_r = _row_shift_left(rider, s, 0.0)
        blocked_r = _row_shift_left(blocked, s, 1)
        open_window = blocked == 0
        pb = jnp.where(open_window, jnp.logaddexp(pb, pb_r), pb)
        pnb = jnp.where(open_window, jnp.logaddexp(pnb, pnb_r), pnb)
        rider = jnp.where(open_window & (idx_r < idx), rider_r, rider)
        idx = jnp.where(open_window, jnp.minimum(idx, idx_r), idx)
        blocked = blocked | blocked_r
    return run_start, pb, pnb, idx, rider


def _lm_step_kernel(frame_ref, pb_ref, pnb_ref, hash_ref, last_ref, len_ref,
                    lm_ref, bonus_ref,
                    opb_ref, opnb_ref, ohash_ref, olast_ref, olen_ref, olm_ref, oidx_ref,
                    *, beam_width, r_pad, ext_count, n_pad, class_count, blank,
                    max_decoded_length, space_index):
    """One beam-search frame for SUBLANES utterances (rows). Candidate layout per row:
    flat lane i -> (parent beam w = i % r, extension e = i // r; e=0 stay,
    e in 1..k extend with the frame's e-th pruned class)."""
    s = pb_ref.shape[0]
    r = r_pad
    frame = frame_ref[:]                       # (S, FRAME_LANES)
    pb = pb_ref[:]
    pnb = pnb_ref[:]
    last = last_ref[:]
    total = jnp.logaddexp(pb, pnb)
    valid = total > NEG_INF / 2

    lp_blank = _row_lane_value(frame, 2 * ext_count + blank, NEG_INF)   # (S, 1)
    lp_last = jnp.full((s, r), NEG_INF)
    for c in range(class_count):
        value = _row_lane_value(frame, 2 * ext_count + c, NEG_INF)
        lp_last = jnp.where(last == c, value, lp_last)

    shape2 = (s, n_pad)
    lane_n = _col_iota(shape2)
    w_of = lane_n % r
    e_of = lane_n // r
    live_cand = e_of <= ext_count

    def expand(state, fill):
        tiled = jnp.concatenate([state] * (n_pad // r), axis=1)
        return jnp.where(live_cand, tiled, fill)

    c_pb = expand(pb, NEG_INF)
    c_pnb = expand(pnb, NEG_INF)
    c_total = expand(total, NEG_INF)
    c_valid = expand(valid.astype(jnp.int32), 0) > 0
    c_hash = expand(hash_ref[:], 0)
    c_last = expand(last, -1)
    c_len = expand(len_ref[:], 0)
    c_lplast = expand(lp_last, NEG_INF)
    c_lm = expand(lm_ref[:], 0.0)
    c_bonus = expand(bonus_ref[:], 0.0)

    ext_score = jnp.full(shape2, NEG_INF)
    ext_char = jnp.full(shape2, -1, jnp.int32)
    for e in range(ext_count):
        in_slot = e_of == (e + 1)
        score_e = _row_lane_value(frame, e, NEG_INF)
        char_e = _row_lane_value(frame, ext_count + e, -1.0).astype(jnp.int32)
        ext_score = jnp.where(in_slot, score_e, ext_score)
        ext_char = jnp.where(in_slot, char_e, ext_char)

    is_stay = e_of == 0
    stay_pb = jnp.where(c_valid, c_total + lp_blank, NEG_INF)
    stay_pnb = jnp.where(c_valid & (c_last >= 0), c_pnb + c_lplast, NEG_INF)
    ext_base = jnp.where(ext_char == c_last, c_pb, c_total)
    ext_ok = c_valid & (ext_char >= 0) & (ext_char != blank) \
        & (c_len < max_decoded_length)
    ext_pnb = jnp.where(ext_ok, ext_base + ext_score, NEG_INF)

    cand_pb = jnp.where(is_stay, stay_pb, NEG_INF)
    cand_pnb = jnp.where(is_stay, stay_pnb, ext_pnb)
    cand_hash = jnp.where(is_stay, c_hash, c_hash * HASH_MULTIPLIER + (ext_char + 2))
    cand_last = jnp.where(is_stay, c_last, ext_char)
    cand_len = jnp.where(is_stay, c_len, jnp.minimum(c_len + 1, max_decoded_length))
    # Per-prefix LM score: the boundary bonus (already pending-masked by the XLA side)
    # joins on space extensions only (reference net.py:449 semantics).
    cand_lm = jnp.where(is_stay | (ext_char != space_index), c_lm, c_lm + c_bonus)
    alive = jnp.logaddexp(cand_pb, cand_pnb) > NEG_INF / 2
    key = jnp.where(alive, cand_hash, DEAD_KEY)
    orig = jnp.where(alive, w_of * (ext_count + 1) + e_of, jnp.int32(2 ** 31 - 1))

    key, _, payloads = _row_bitonic_sort(
        key, [cand_pb, cand_pnb, orig, cand_last, cand_len, cand_lm])
    s_pb, s_pnb, s_orig, s_last, s_len, s_lm = payloads
    run_start, m_pb, m_pnb, m_idx, m_lm = _row_segmented_merge(
        key, s_pb, s_pnb, s_orig, s_lm)

    # Only run starts may represent a merged prefix (duplicates carry finite partial
    # masses from the backward scan — see the matching mask in decode_pallas.py).
    m_pb = jnp.where(run_start, m_pb, NEG_INF)
    m_pnb = jnp.where(run_start, m_pnb, NEG_INF)
    score = jnp.where(run_start & (key != DEAD_KEY),
                      jnp.logaddexp(m_pb, m_pnb) + m_lm, NEG_INF)
    _, _, payloads2 = _row_bitonic_sort(
        -score, [m_pb, m_pnb, key, m_idx, s_last, s_len, m_lm], secondary=m_idx)
    f_pb, f_pnb, f_key, f_idx, f_last, f_len, f_lm = [p[:, :r] for p in payloads2]

    lane_r = _col_iota((s, r))
    in_beam = (lane_r < beam_width) & (jnp.logaddexp(f_pb, f_pnb) > NEG_INF / 2)
    opb_ref[:] = jnp.where(in_beam, f_pb, NEG_INF)
    opnb_ref[:] = jnp.where(in_beam, f_pnb, NEG_INF)
    ohash_ref[:] = jnp.where(in_beam, f_key, 0)
    olast_ref[:] = jnp.where(in_beam, f_last, -1)
    olen_ref[:] = jnp.where(in_beam, f_len, 0)
    olm_ref[:] = jnp.where(in_beam, f_lm, 0.0)
    oidx_ref[:] = jnp.where(in_beam, f_idx, lane_r * (ext_count + 1))


def _pack_frames(log_probs, k, b_pad):
    """(B, T, C) log posteriors -> (T, b_pad, FRAME_LANES) kernel frame rows: per
    frame the top-``k`` pruned extension scores, their class ids (as f32 lanes),
    the full class row (for blank/stay lookups), NEG_INF lane padding, and NEG_INF
    batch-padding rows."""
    batch, t_max, class_count = log_probs.shape
    log_probs = log_probs.astype(jnp.float32)
    frame_scores, frame_chars = jax.lax.top_k(log_probs, k)
    packed = jnp.concatenate(
        [frame_scores, frame_chars.astype(jnp.float32), log_probs,
         jnp.full((batch, t_max, FRAME_LANES - class_count - 2 * k), NEG_INF)], axis=2)
    packed = jnp.pad(packed, ((0, b_pad - batch), (0, 0), (0, 0)),
                     constant_values=NEG_INF)
    return packed.transpose(1, 0, 2)


def _build_step(b_pad, r, k, n_pad, class_count, blank, beam_width,
                max_decoded_length, space_index):
    """The one-frame beam kernel as a callable: ``step(frame_row, pb, pnb, hash,
    last, len, lm, bonus) -> (pb, pnb, hash, last, len, lm, selected_idx)``, each
    state block (b_pad, r)."""
    kernel = functools.partial(
        _lm_step_kernel, beam_width=beam_width, r_pad=r, ext_count=k, n_pad=n_pad,
        class_count=class_count, blank=blank, max_decoded_length=max_decoded_length,
        space_index=space_index)
    grid = (b_pad // SUBLANES,)
    state_spec = pl.BlockSpec((SUBLANES, r), lambda g: (g, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((SUBLANES, FRAME_LANES), lambda g: (g, 0))]
        + [state_spec] * 7,
        out_specs=[state_spec] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, r), jnp.float32),   # pb
            jax.ShapeDtypeStruct((b_pad, r), jnp.float32),   # pnb
            jax.ShapeDtypeStruct((b_pad, r), jnp.int32),     # hash
            jax.ShapeDtypeStruct((b_pad, r), jnp.int32),     # last
            jax.ShapeDtypeStruct((b_pad, r), jnp.int32),     # len
            jax.ShapeDtypeStruct((b_pad, r), jnp.float32),   # lm
            jax.ShapeDtypeStruct((b_pad, r), jnp.int32),     # selected candidate idx
        ],
        interpret=jax.default_backend() != "tpu",
    )


def _fresh_carry(b_pad, r, word_lm):
    """The scan carry at stream start: one live empty prefix per row (lane 0,
    log P(blank)=0, EMPTY_HASH), everything else dead — the sublane-batched analog
    of `decode_jax.initial_beam_state`."""
    lane0 = jnp.arange(r)[None, :] == 0
    init = (
        jnp.where(lane0, 0.0, NEG_INF) * jnp.ones((b_pad, 1)),        # pb
        jnp.full((b_pad, r), NEG_INF),                                # pnb
        jnp.where(lane0, EMPTY_HASH, 0) * jnp.ones((b_pad, 1), jnp.int32),  # hash
        jnp.full((b_pad, r), -1, jnp.int32),                          # last
        jnp.zeros((b_pad, r), jnp.int32),                             # len
        jnp.zeros((b_pad, r)),                                        # lm score
    )
    if word_lm is not None:
        init = init + (
            jnp.zeros((b_pad, r), jnp.int32),                         # trie node
            jnp.full((b_pad, r, 2), word_lm.bos_id, jnp.int32),       # word context
        )
    return init


def _make_scan_body(step, word_lm, b_pad, r, k, counts, lm_weight,
                    word_count_weight, valid_word_count_weight):
    """The per-frame scan body around the kernel: the word-LM trie walk + hashed
    n-gram probes as vectorized XLA gathers, the per-row ``t < counts`` active mask
    (inactive frames are exact no-ops, emitting identity backpointers), and the
    (parent, emitted char) backpointer record. Shared by the offline decode
    (``counts`` = utterance lengths) and the incremental advance (``counts`` =
    per-chunk valid frame counts, `decode_incremental_pallas.py`)."""
    from .decode_jax import _word_bonuses

    use_lm = word_lm is not None

    def beam_lane(x):
        return jnp.broadcast_to(jnp.arange(r)[None, :], (b_pad, r))

    def body(carry, xt):
        pb, pnb, hsh, last, lnb, lm = carry[:6]
        frame_row, t = xt
        if use_lm:
            trie, wctx = carry[6:]
            bonus, _, normalized = _word_bonuses(
                word_lm, trie.reshape(-1), wctx.reshape(-1, 2), lm_weight,
                word_count_weight, valid_word_count_weight)
            bonus = bonus.reshape(b_pad, r).astype(jnp.float32)
            normalized = normalized.reshape(b_pad, r)
        else:
            bonus = jnp.zeros((b_pad, r), jnp.float32)

        npb, npnb, nhsh, nlast, nlen, nlm, idx = step(
            frame_row, pb, pnb, hsh, last, lnb, lm, bonus)

        parent = idx // (k + 1)
        emitted = (idx % (k + 1)) > 0
        active = (t < counts)[:, None]

        def sel(new, old):
            return jnp.where(active if new.ndim == 2 else active[..., None], new, old)

        new_carry = (sel(npb, pb), sel(npnb, pnb), sel(nhsh, hsh), sel(nlast, last),
                     sel(nlen, lnb), sel(nlm, lm))
        if use_lm:
            ext_char = jnp.where(emitted, nlast, -1)
            parent_trie = jnp.take_along_axis(trie, parent, axis=1)
            parent_wctx = jnp.take_along_axis(
                wctx, parent[..., None], axis=1)                       # (B, r, 2)
            char = jnp.clip(ext_char, 0, word_lm.trie.shape[1] - 1)
            is_space = emitted & (ext_char == word_lm.space_index)
            is_char_ext = emitted & ~is_space
            walked = jnp.where(parent_trie < 0, -1,
                               word_lm.trie[jnp.maximum(parent_trie, 0), char])
            ntrie = jnp.where(is_char_ext, walked, jnp.where(is_space, 0, parent_trie))
            shift = is_space & (parent_trie != 0)
            parent_norm = jnp.take_along_axis(normalized, parent, axis=1)
            nwctx = jnp.stack(
                [jnp.where(shift, parent_wctx[..., 1], parent_wctx[..., 0]),
                 jnp.where(shift, parent_norm, parent_wctx[..., 1])], axis=-1)
            new_carry = new_carry + (sel(ntrie, trie), sel(nwctx, wctx))
        bp_parent = jnp.where(active, parent, beam_lane(parent))
        bp_char = jnp.where(active & emitted, nlast, -1)
        return new_carry, (bp_parent, bp_char)

    return body


@functools.partial(jax.jit, static_argnames=("blank", "beam_width",
                                             "max_decoded_length", "lm_weight",
                                             "word_count_weight",
                                             "valid_word_count_weight",
                                             "word_lm_static", "prune_classes"))
def _pallas_lm_impl(log_probs, lengths, blank, beam_width, max_decoded_length,
                    word_arrays, word_lm_static, lm_weight, word_count_weight,
                    valid_word_count_weight, prune_classes):
    from ..lm.device_lm import DeviceWordLm
    from .decode_jax import _word_bonuses, backtrace_tokens

    use_lm = word_arrays is not None
    if use_lm:
        word_lm = DeviceWordLm(*word_arrays, *word_lm_static)
        space_index = int(word_lm_static[3])
    else:
        word_lm = None
        space_index = -2  # never matches an extension char: cand_lm stays 0
    batch, t_max, class_count = log_probs.shape
    k = min(prune_classes, class_count)
    r = _next_pow2(max(beam_width, 8))
    n_pad = _next_pow2((k + 1) * r)
    b_pad = ((batch + SUBLANES - 1) // SUBLANES) * SUBLANES

    frames_t = _pack_frames(log_probs, k, b_pad)          # (T, B_pad, FRAME_LANES)
    lengths_pad = jnp.pad(lengths.astype(jnp.int32), (0, b_pad - batch))

    step = _build_step(b_pad, r, k, n_pad, class_count, blank, beam_width,
                       max_decoded_length, space_index)
    init = _fresh_carry(b_pad, r, word_lm)
    body = _make_scan_body(step, word_lm, b_pad, r, k, lengths_pad, lm_weight,
                           word_count_weight, valid_word_count_weight)

    carry, (parents, chars) = jax.lax.scan(body, init, (frames_t, jnp.arange(t_max)))
    pb, pnb, _, _, lens, lm = carry[:6]
    if use_lm:
        trie, wctx = carry[6:]
        tail_bonus, _, _ = _word_bonuses(
            word_lm, trie.reshape(-1), wctx.reshape(-1, 2), lm_weight,
            word_count_weight, valid_word_count_weight)
        final = jnp.logaddexp(pb, pnb) + lm + tail_bonus.reshape(b_pad, r)
    else:
        final = jnp.logaddexp(pb, pnb)
    best = jnp.argmax(final, axis=1)
    parents = parents.transpose(1, 0, 2)[:batch]          # (B, T, r)
    chars = chars.transpose(1, 0, 2)[:batch]
    tokens, counts = jax.vmap(
        lambda parents_b, chars_b, best_b, lens_b: backtrace_tokens(
            parents_b, chars_b, best_b, lens_b[best_b], max_decoded_length)
    )(parents, chars, best[:batch], lens[:batch])
    return tokens, counts.astype(jnp.int32)


def beam_search_decode_pallas_lm(log_probs, lengths, blank, word_lm, beam_width=25,
                                 max_decoded_length=256, lm_weight=0.8,
                                 word_count_weight=0.0, valid_word_count_weight=2.3,
                                 prune_classes=8):
    """Batched on-device prefix beam search with WORD-level LM fusion.

    Same contract (tokens, counts) and same weights as
    `decode_jax.beam_search_decode_jax(word_lm=..., prune_classes=k)`; the beam-merge
    runs as a Pallas kernel with 8 utterances per sublane block, the LM trie walk and
    hashed n-gram probes run as vectorized XLA gathers between frames.
    Ref: `/root/reference/speechless/net.py:444-451` (KenLM-fused beam decode).
    """
    class_count = log_probs.shape[-1]
    if class_count + 2 * min(prune_classes, class_count) > FRAME_LANES:
        raise ValueError("alphabet too large for the packed frame row")
    word_lm = word_lm.as_device()
    word_arrays = tuple(word_lm[:9])
    word_static = (word_lm.max_probes, word_lm.bos_id, word_lm.unk_id,
                   word_lm.space_index)
    return _pallas_lm_impl(log_probs, lengths.astype(jnp.int32), blank, beam_width,
                           max_decoded_length, word_arrays, word_static, lm_weight,
                           word_count_weight, valid_word_count_weight, prune_classes)


def beam_search_decode_pallas_frames(log_probs, lengths, blank, beam_width=25,
                                     max_decoded_length=256, prune_classes=8):
    """Batched on-device prefix beam search WITHOUT an LM on the frame-step kernel.

    Same (tokens, counts) contract as `decode_pallas.beam_search_decode_pallas`, but
    runs the sublane-batched one-frame kernel in a `lax.scan` instead of the whole-loop
    single-row kernel. The 8-utterances-per-sublane-block layout runs every sort stage
    on all 8 sublanes, which measured ~4x faster than the whole-loop kernel at W=25
    (it cannot, however, express the per-utterance `skip_blank_log_prob` frame-skip
    fast path — callers wanting that stay on the whole-loop kernel).
    Ref: `/root/reference/speechless/net.py:431-439` (plain beam decode).
    """
    class_count = log_probs.shape[-1]
    if class_count + 2 * min(prune_classes, class_count) > FRAME_LANES:
        raise ValueError("alphabet too large for the packed frame row")
    return _pallas_lm_impl(log_probs, lengths.astype(jnp.int32), blank, beam_width,
                           max_decoded_length, None, None, 0.0, 0.0, 0.0,
                           prune_classes)
