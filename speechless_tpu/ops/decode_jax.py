"""On-device (jitted) CTC prefix beam search.

The reference's beam decoding runs in TF's C++ on the device it trains on; the host-side
prefix search in ``decode.py`` covers the LM-fused parity path, and this module provides a
fully on-device, batched, jit-compiled beam search (no host round-trips, static shapes):

* beams are (prefix tokens, rolling hash, log P ending-in-blank, log P ending-in-non-blank);
* each step expands every beam with every character (plus the stay/blank case), then merges
  identical prefixes by sorting on the 32-bit rolling hash and segment-logsumexp-ing the
  probability mass — the hash stands in for prefix equality (collisions are ~2^-32 per pair);
* top-W selection via ``lax.top_k``; the whole time loop is one ``lax.scan``.

Semantics match ``decode.beam_search_decode`` without an LM (verified in tests), i.e. TF
``ctc_beam_search_decoder(merge_repeated=False)``.
"""
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..lm.char_ngram import advance_context

NEG_INF = -1e30
HASH_MULTIPLIER = jnp.uint32(0x01000193)  # FNV-ish
EMPTY_HASH = jnp.uint32(0x811C9DC5)


def _segment_logsumexp(values: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    maxima = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    maxima_safe = jnp.maximum(maxima, NEG_INF)
    shifted = jnp.exp(values - maxima_safe[segment_ids])
    sums = jax.ops.segment_sum(shifted, segment_ids, num_segments=num_segments)
    return jnp.where(sums > 0, maxima_safe + jnp.log(jnp.maximum(sums, 1e-38)), NEG_INF)


def _beam_step(state, log_probs_t, active, blank: int, beam_width: int, max_len: int,
               lm_table=None, lm_weight: float = 0.0, lm_base: int = 0, lm_order: int = 2):
    """One time step of prefix beam search for one batch element. ``lm_table`` is an
    optional dense char-n-gram log10-prob table (contexts, classes) applied as shallow
    fusion on every extension; per-beam rolling context indices ride in the state."""
    prefixes, lengths, hashes, p_b, p_nb, contexts = state
    class_count = log_probs_t.shape[0]
    w = beam_width
    n = w * (class_count + 1)

    total = jnp.logaddexp(p_b, p_nb)
    valid = total > NEG_INF / 2
    last = jnp.where(lengths > 0,
                     prefixes[jnp.arange(w), jnp.maximum(lengths - 1, 0)], -1)

    # Candidate 0 per beam: prefix unchanged (emit blank, or re-emit the last char).
    stay_pb = jnp.where(valid, total + log_probs_t[blank], NEG_INF)
    stay_pnb = jnp.where(valid & (last >= 0), p_nb + log_probs_t[jnp.maximum(last, 0)],
                         NEG_INF)

    # Candidates 1..C per beam: extend with character c (blank slot is masked out).
    chars = jnp.arange(class_count)
    ext_scores = jnp.where(chars[None, :] == last[:, None],
                           p_b[:, None] + log_probs_t[None, :],
                           total[:, None] + log_probs_t[None, :])  # (W, C)
    # Extensions are forbidden once a prefix hits capacity: a dropped-but-counted token
    # would desync the stored prefix from the hash/LM context.
    ext_scores = jnp.where(valid[:, None] & (chars[None, :] != blank) &
                           (lengths < max_len)[:, None], ext_scores, NEG_INF)
    if lm_table is not None:
        # Shallow fusion: log10 P_lm(c | rolling char context), scaled into natural log.
        # The table covers the lm alphabet (no blank); classes the LM does not know get a
        # uniform floor rather than probability 1, so fusion never favors unscored symbols.
        lm_scores = lm_table[contexts]  # (W, lm_base)
        if lm_scores.shape[1] < class_count:
            uniform_floor = -math.log10(max(lm_base, 2))
            lm_scores = jnp.pad(lm_scores,
                                ((0, 0), (0, class_count - lm_scores.shape[1])),
                                constant_values=uniform_floor)
        ext_scores = ext_scores + lm_weight * lm_scores * 2.302585093
    ext_hashes = hashes[:, None] * HASH_MULTIPLIER + (chars[None, :] + 2).astype(jnp.uint32)

    # Flatten: candidate n = beam w * (C+1) + e, with e=0 stay, e=c+1 extend-with-c.
    all_pb = jnp.concatenate([stay_pb[:, None], jnp.full((w, class_count), NEG_INF)],
                             axis=1).reshape(n)
    all_pnb = jnp.concatenate([stay_pnb[:, None], ext_scores], axis=1).reshape(n)
    all_hashes = jnp.concatenate([hashes[:, None], ext_hashes], axis=1).reshape(n)
    alive = jnp.logaddexp(all_pb, all_pnb) > NEG_INF / 2
    all_hashes = jnp.where(alive, all_hashes, jnp.uint32(0))

    # Merge candidates with identical prefixes (equal hashes) via sort + segment-lse.
    order = jnp.argsort(all_hashes)
    sorted_hashes = all_hashes[order]
    run_start = jnp.concatenate([jnp.ones((1,), bool),
                                 sorted_hashes[1:] != sorted_hashes[:-1]])
    segment_ids = jnp.cumsum(run_start) - 1
    merged_pb = _segment_logsumexp(all_pb[order], segment_ids, n)
    merged_pnb = _segment_logsumexp(all_pnb[order], segment_ids, n)
    # Stay in uint32: under the default x64-disabled config an int64 cast silently becomes
    # int32 and flips large hashes negative, corrupting the dead-segment test.
    seg_hash = jax.ops.segment_max(sorted_hashes, segment_ids, num_segments=n)
    # Representative original candidate per segment (for prefix reconstruction).
    seg_repr = jax.ops.segment_min(order, segment_ids, num_segments=n)

    merged_total = jnp.logaddexp(merged_pb, merged_pnb)
    merged_total = jnp.where(seg_hash > jnp.uint32(0), merged_total, NEG_INF)

    top_scores, top_segments = jax.lax.top_k(merged_total, w)
    top_repr = seg_repr[top_segments]
    parent = top_repr // (class_count + 1)
    extension = top_repr % (class_count + 1)  # 0 = stay, c+1 = extended

    new_pb = merged_pb[top_segments]
    new_pnb = merged_pnb[top_segments]
    new_hashes = jnp.where(top_scores > NEG_INF / 2, seg_hash[top_segments], jnp.uint32(0))

    parent_prefixes = prefixes[parent]
    parent_lengths = lengths[parent]
    parent_contexts = contexts[parent]
    if lm_table is not None:
        # Rolling context via the char_ngram helper (base = lm alphabet + BOS);
        # out-of-LM-alphabet characters reset to the all-BOS start context.
        char = jnp.maximum(extension - 1, 0)
        start_context = lm_table.shape[0] - 1
        extended_ctx = jnp.where(char < lm_base,
                                 advance_context(parent_contexts, char, lm_base, lm_order),
                                 start_context)
        new_contexts = jnp.where(extension > 0, extended_ctx, parent_contexts)
    else:
        new_contexts = parent_contexts
    position = jnp.arange(max_len)[None, :]
    appended = jnp.where(position == parent_lengths[:, None], (extension - 1)[:, None],
                         parent_prefixes)
    new_prefixes = jnp.where((extension > 0)[:, None], appended, parent_prefixes)
    # Clamp at capacity: a token beyond max_len is dropped by the positional write above,
    # so the count must not claim it either.
    new_lengths = jnp.minimum(parent_lengths + (extension > 0), max_len)

    new_state = (new_prefixes, new_lengths, new_hashes, new_pb, new_pnb, new_contexts)
    # Outside the valid range, keep the old state (frame masked out; `active` is scalar).
    return jax.tree.map(lambda new, old: jnp.where(active, new, old), new_state, state)


@partial(jax.jit, static_argnames=("blank", "beam_width", "max_decoded_length",
                                   "lm_weight"))
def beam_search_decode_jax(log_probs: jnp.ndarray, lengths: jnp.ndarray, blank: int,
                           beam_width: int = 25,
                           max_decoded_length: int = 256,
                           lm_table: jnp.ndarray = None,
                           lm_weight: float = 0.5
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC prefix beam search, optionally with char-n-gram LM fusion.

    Args:
      log_probs: ``(batch, time, classes)`` log probabilities.
      lengths: ``(batch,)`` valid frame counts.
      lm_table: optional dense char-LM table (``lm/char_ngram.py``), (contexts, classes)
        log10 probs resident on device; fused with weight ``lm_weight``.
    Returns:
      ``tokens (batch, max_decoded_length) int32`` (-1 padded) and ``counts (batch,)``.
    """
    batch, t_max, class_count = log_probs.shape
    w = beam_width

    def decode_one(lp, length):
        prefixes = -jnp.ones((w, max_decoded_length), jnp.int32)
        lengths0 = jnp.zeros((w,), jnp.int32)
        hashes = jnp.concatenate([jnp.asarray([EMPTY_HASH]),
                                  jnp.zeros((w - 1,), jnp.uint32)])
        p_b = jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), NEG_INF)])
        p_nb = jnp.full((w,), NEG_INF)
        if lm_table is not None:
            lm_base = lm_table.shape[1]
            lm_order = round(math.log(lm_table.shape[0]) / math.log(lm_base + 1)) + 1
            contexts = jnp.full((w,), lm_table.shape[0] - 1, jnp.int32)  # all-BOS start
        else:
            lm_base, lm_order = 0, 2
            contexts = jnp.zeros((w,), jnp.int32)
        state = (prefixes, lengths0, hashes, p_b, p_nb, contexts)

        def step(state, t):
            new_state = _beam_step(state, lp[t], t < length, blank, w, max_decoded_length,
                                   lm_table=lm_table, lm_weight=lm_weight, lm_base=lm_base,
                                   lm_order=lm_order)
            return new_state, None

        (prefixes, lengths_out, _, p_b, p_nb, _), _ = jax.lax.scan(
            step, state, jnp.arange(t_max))
        best = jnp.argmax(jnp.logaddexp(p_b, p_nb))
        return prefixes[best], lengths_out[best]

    tokens, counts = jax.vmap(decode_one)(log_probs, lengths)
    return tokens, counts.astype(jnp.int32)
