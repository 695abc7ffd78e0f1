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
import numpy as np

from ..lm.char_ngram import advance_context

NEG_INF = -1e30
# numpy (not jnp) scalars: module import must never initialize the JAX backend —
# spawn-pool cache-fill workers import this package, and host-only use (e.g. the C++
# beam path) must survive an unreachable TPU tunnel.
HASH_MULTIPLIER = np.uint32(0x01000193)  # FNV-ish
EMPTY_HASH = np.uint32(0x811C9DC5)


def backtrace_tokens(parents, emit_chars, best, count, max_decoded_length):
    """Reconstruct one utterance's winning prefix from per-frame backpointers.

    ``parents``/``emit_chars`` are the (T, W) per-frame (parent beam, emitted char or
    -1) records, ``best`` the winning final beam, ``count`` its prefix length. Returns
    ``(tokens (max_decoded_length,) int32 -1-padded, count)``. Shared by the XLA beam
    and the Pallas kernel (`decode_pallas.py`)."""
    t_max = parents.shape[0]

    def trace(beam, pointers):
        step_parents, step_chars = pointers
        return step_parents[beam], step_chars[beam]

    _, path_chars = jax.lax.scan(trace, best, (parents, emit_chars), reverse=True)
    t_range = jnp.arange(t_max)
    kept = path_chars >= 0
    order = jnp.argsort(jnp.where(kept, t_range, t_range + t_max))
    packed = path_chars[order]
    out = jnp.arange(max_decoded_length)
    tokens = jnp.where(out < count, packed[jnp.minimum(out, t_max - 1)], -1)
    return tokens, count


def lm_table_geometry(lm_table) -> tuple:
    """``(base, order)`` of a packed char-LM context table (`lm/char_ngram.py`
    layout: (base+1)**(order-1) context rows x base next-char columns). One place
    derives it — the offline beam and the streaming decoder must agree exactly."""
    if lm_table is None:
        return 0, 2
    base = lm_table.shape[1]
    return base, round(math.log(lm_table.shape[0]) / math.log(base + 1)) + 1


def initial_beam_state(beam_width: int, lm_table=None, bos: int = 0):
    """The prefix beam's initial carry: one live empty prefix (log P(blank)=0), the
    rest dead. Shared by the offline decoder (`_beam_search_impl`) and the streaming
    decoder (`decode_incremental.BeamStreamDecoder`), whose chunked-equals-offline
    exactness guarantee requires bit-identical initial state.

    Char-LM contexts start at the all-BOS row (the table's last row). Word-LM
    registers start as an empty word at the trie root with context (BOS, BOS) — the
    ARPA cannot hold (<s>, <s>, w) n-grams, so the uniform trigram lookup reproduces
    the host scorer's shorter-n-gram handling for the first words exactly."""
    w = beam_width
    if lm_table is not None:
        contexts = jnp.full((w,), lm_table.shape[0] - 1, jnp.int32)  # all-BOS start
    else:
        contexts = jnp.zeros((w,), jnp.int32)
    return (jnp.zeros((w,), jnp.int32),                                    # lengths
            -jnp.ones((w,), jnp.int32),                                    # last_chars
            jnp.concatenate([jnp.asarray([EMPTY_HASH]),
                             jnp.zeros((w - 1,), jnp.uint32)]),            # hashes
            jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), NEG_INF)]),  # p_b
            jnp.full((w,), NEG_INF),                                       # p_nb
            contexts,
            jnp.zeros((w,)),                                               # lm_scores
            jnp.zeros((w,), jnp.int32),                                    # trie_nodes
            jnp.full((w, 2), bos, jnp.int32))                              # word_ctx


def _segment_logsumexp(values: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    maxima = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    maxima_safe = jnp.maximum(maxima, NEG_INF)
    shifted = jnp.exp(values - maxima_safe[segment_ids])
    sums = jax.ops.segment_sum(shifted, segment_ids, num_segments=num_segments)
    return jnp.where(sums > 0, maxima_safe + jnp.log(jnp.maximum(sums, 1e-38)), NEG_INF)


def _word_bonuses(word_lm, trie_nodes, word_contexts, lm_weight: float,
                  word_count_weight: float, valid_word_count_weight: float):
    """Per-beam bonus a space extension would earn now (host `lm_bonus` semantics:
    nothing for empty/just-terminated words; OOV words score as <unk> with no validity
    bonus). Returns (bonus (W,), pending (W,) bool, normalized word ids (W,))."""
    from ..lm.device_lm import score_word_device

    pending = trie_nodes != 0
    completed = jnp.where(trie_nodes > 0,
                          word_lm.node_word[jnp.maximum(trie_nodes, 0)], -1)
    normalized = jnp.where(completed >= 0, completed, word_lm.unk_id)
    log10_p = score_word_device(word_lm, word_contexts[:, 0], word_contexts[:, 1],
                                normalized)
    bonus = jnp.where(pending,
                      lm_weight * log10_p + word_count_weight
                      + valid_word_count_weight * (completed >= 0), 0.0)
    return bonus, pending, normalized


def _beam_step(state, log_probs_t, active, blank: int, beam_width: int, max_len: int,
               lm_table=None, lm_weight: float = 0.0, lm_base: int = 0, lm_order: int = 2,
               word_lm=None, word_count_weight: float = 0.0,
               valid_word_count_weight: float = 0.0, prune_classes=None,
               lexicon_constrained: bool = False):
    """One time step of prefix beam search for one batch element.

    ``lm_table`` is an optional dense char-n-gram log10-prob table (contexts, classes)
    applied as shallow fusion on every extension (folded into the non-blank mass);
    per-beam rolling context indices ride in the state.

    ``word_lm`` is an optional `DeviceWordLm`: word-level fusion at space boundaries with
    the reference's three weights, kept in a SEPARATE per-beam lm score (the host beam's
    accounting: acoustic masses merge by logsumexp, the lm term is a function of the
    prefix) that joins the ranking and the final argmax.

    Prefixes are NOT materialized in the carry: each step emits backpointers
    ``(parent beam, emitted char or -1)`` and the winning prefix is rebuilt by a reverse
    scan afterwards — carrying a (W, max_len) token buffer through the scan costs
    W*max_len*4 bytes of HBM traffic per step for data the merge never reads (only the
    rolling hash and the last character matter during search)."""
    lengths, last_chars, hashes, p_b, p_nb, contexts, lm_scores, trie_nodes, word_ctx = state
    class_count = log_probs_t.shape[0]
    w = beam_width

    # Per-frame class pruning: only the k most probable classes can extend a prefix this
    # frame (the device analog of the C++ decoder's per-frame probability floor —
    # output-identical on peaky trained outputs, and it shrinks the merge sort from
    # W*(C+1) to W*(k+1) candidates). No pruning: the identity permutation of all classes.
    if prune_classes is not None and prune_classes < class_count:
        frame_scores, frame_chars = jax.lax.top_k(log_probs_t, prune_classes)  # (k,)
    else:
        frame_chars = jnp.arange(class_count)
        frame_scores = log_probs_t
    k = frame_chars.shape[0]
    n = w * (k + 1)

    total = jnp.logaddexp(p_b, p_nb)
    valid = total > NEG_INF / 2
    last = last_chars

    # Candidate 0 per beam: prefix unchanged (emit blank, or re-emit the last char).
    stay_pb = jnp.where(valid, total + log_probs_t[blank], NEG_INF)
    stay_pnb = jnp.where(valid & (last >= 0), p_nb + log_probs_t[jnp.maximum(last, 0)],
                         NEG_INF)

    # Candidates 1..k per beam: extend with frame_chars[e-1] (blank slot is masked out).
    ext_scores = jnp.where(frame_chars[None, :] == last[:, None],
                           p_b[:, None] + frame_scores[None, :],
                           total[:, None] + frame_scores[None, :])  # (W, k)
    # Extensions are forbidden once a prefix hits capacity: a dropped-but-counted token
    # would desync the stored prefix from the hash/LM context.
    ext_scores = jnp.where(valid[:, None] & (frame_chars[None, :] != blank) &
                           (lengths < max_len)[:, None], ext_scores, NEG_INF)
    if word_lm is not None and lexicon_constrained:
        # Lexicon-constrained search (wav2letter's production decode mode): a character
        # extension must stay ON the vocabulary trie, and a space may only terminate a
        # complete vocabulary word (or follow a space/BOS — trie node 0, the empty
        # word). Every emitted word is therefore in-vocabulary by construction; the
        # trailing word may be a prefix of one (hypotheses are ranked mid-word too).
        char_cols = jnp.clip(frame_chars, 0, word_lm.trie.shape[1] - 1)
        walked_all = word_lm.trie[jnp.maximum(trie_nodes, 0)[:, None],
                                  char_cols[None, :]]  # (W, k)
        walked_all = jnp.where((trie_nodes >= 0)[:, None], walked_all, -1)
        word_done = word_lm.node_word[jnp.maximum(trie_nodes, 0)] >= 0
        is_space_col = frame_chars[None, :] == word_lm.space_index
        allowed = jnp.where(is_space_col,
                            (word_done | (trie_nodes == 0))[:, None],
                            walked_all >= 0)
        ext_scores = jnp.where(allowed, ext_scores, NEG_INF)
    if lm_table is not None:
        # Shallow fusion: log10 P_lm(c | rolling char context), scaled into natural log.
        # The table covers the lm alphabet (no blank); classes the LM does not know get a
        # uniform floor rather than probability 1, so fusion never favors unscored symbols.
        char_lm_scores = lm_table[contexts]  # (W, lm_base)
        uniform_floor = -math.log10(max(lm_base, 2))
        char_lm_scores = jnp.where(
            frame_chars[None, :] < char_lm_scores.shape[1],
            char_lm_scores[jnp.arange(w)[:, None],
                           jnp.minimum(frame_chars, char_lm_scores.shape[1] - 1)[None, :]],
            uniform_floor)
        ext_scores = ext_scores + lm_weight * char_lm_scores * 2.302585093
    ext_hashes = hashes[:, None] * HASH_MULTIPLIER \
        + (frame_chars[None, :] + 2).astype(jnp.uint32)

    # Flatten: candidate n = beam w * (k+1) + e, with e=0 stay, e>0 extend frame_chars[e-1].
    all_pb = jnp.concatenate([stay_pb[:, None], jnp.full((w, k), NEG_INF)],
                             axis=1).reshape(n)
    all_pnb = jnp.concatenate([stay_pnb[:, None], ext_scores], axis=1).reshape(n)
    all_hashes = jnp.concatenate([hashes[:, None], ext_hashes], axis=1).reshape(n)
    if word_lm is not None:
        bonus, _, normalized = _word_bonuses(word_lm, trie_nodes, word_ctx, lm_weight,
                                             word_count_weight, valid_word_count_weight)
        # The lm term is per-prefix (all merge sources agree), so candidates carry the
        # parent's accumulated score plus the boundary bonus on the space column only.
        ext_lm = jnp.where(frame_chars[None, :] == word_lm.space_index,
                           bonus[:, None], 0.0)
        all_lm = (lm_scores[:, None]
                  + jnp.concatenate([jnp.zeros((w, 1)), ext_lm], axis=1)).reshape(n)
    else:
        normalized = None
        all_lm = jnp.zeros((n,))
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

    # Ranking includes the (per-prefix) word-lm score; acoustic masses stay pure.
    top_scores, top_segments = jax.lax.top_k(merged_total + all_lm[seg_repr], w)
    top_repr = seg_repr[top_segments]
    parent = top_repr // (k + 1)
    extension = top_repr % (k + 1)  # 0 = stay, e>0 = extended with frame_chars[e-1]
    # The actual class extended with (valid only where extension > 0).
    ext_char = frame_chars[jnp.maximum(extension - 1, 0)]

    new_pb = merged_pb[top_segments]
    new_pnb = merged_pnb[top_segments]
    new_lm = all_lm[top_repr]
    new_hashes = jnp.where(top_scores > NEG_INF / 2, seg_hash[top_segments], jnp.uint32(0))

    parent_lengths = lengths[parent]
    parent_contexts = contexts[parent]
    if lm_table is not None:
        # Rolling context via the char_ngram helper (base = lm alphabet + BOS);
        # out-of-LM-alphabet characters reset to the all-BOS start context.
        start_context = lm_table.shape[0] - 1
        extended_ctx = jnp.where(ext_char < lm_base,
                                 advance_context(parent_contexts, ext_char, lm_base,
                                                 lm_order),
                                 start_context)
        new_contexts = jnp.where(extension > 0, extended_ctx, parent_contexts)
    else:
        new_contexts = parent_contexts
    if word_lm is not None:
        char = jnp.clip(ext_char, 0, word_lm.trie.shape[1] - 1)
        parent_trie = trie_nodes[parent]
        parent_wctx = word_ctx[parent]
        is_space = (extension > 0) & (ext_char == word_lm.space_index)
        is_char_ext = (extension > 0) & ~is_space
        walked = jnp.where(parent_trie < 0, -1,
                           word_lm.trie[jnp.maximum(parent_trie, 0), char])
        new_trie = jnp.where(is_char_ext, walked,
                             jnp.where(is_space, 0, parent_trie))
        parent_pending = parent_trie != 0
        shift = is_space & parent_pending  # word completed: push it into the context
        new_word_ctx = jnp.stack(
            [jnp.where(shift, parent_wctx[:, 1], parent_wctx[:, 0]),
             jnp.where(shift, normalized[parent], parent_wctx[:, 1])], axis=1)
    else:
        new_trie = trie_nodes[parent]
        new_word_ctx = word_ctx[parent]
    emitted = extension > 0
    new_last = jnp.where(emitted, ext_char, last_chars[parent])
    # Capacity: extensions were already forbidden at max_len, so the count stays honest.
    new_lengths = jnp.minimum(parent_lengths + emitted, max_len)

    new_state = (new_lengths, new_last, new_hashes, new_pb, new_pnb, new_contexts,
                 new_lm, new_trie, new_word_ctx)
    # Outside the valid range, keep the old state (frame masked out; `active` is scalar).
    new_state = jax.tree.map(lambda new, old: jnp.where(active, new, old), new_state, state)
    # Backpointers for prefix reconstruction: inactive frames pass beams through.
    backpointers = (jnp.where(active, parent, jnp.arange(w)),
                    jnp.where(active & emitted, ext_char, -1))
    return new_state, backpointers


@partial(jax.jit, static_argnames=("blank", "beam_width", "max_decoded_length",
                                   "lm_weight", "word_count_weight",
                                   "valid_word_count_weight", "word_lm_static",
                                   "prune_classes", "nbest", "lexicon_constrained"))
def _beam_search_impl(log_probs, lengths, blank, beam_width, max_decoded_length,
                      lm_table, lm_weight, word_arrays, word_lm_static,
                      word_count_weight, valid_word_count_weight, prune_classes,
                      nbest=0, lexicon_constrained=False):
    batch, t_max, class_count = log_probs.shape
    w = beam_width
    if word_arrays is not None:
        from ..lm.device_lm import DeviceWordLm

        word_lm = DeviceWordLm(*word_arrays, *word_lm_static)
        bos = word_lm.bos_id
    else:
        word_lm, bos = None, 0

    lm_base, lm_order = lm_table_geometry(lm_table)

    def decode_one(lp, length):
        state = initial_beam_state(w, lm_table=lm_table, bos=bos)

        def step(state, t):
            return _beam_step(state, lp[t], t < length, blank, w, max_decoded_length,
                              lm_table=lm_table, lm_weight=lm_weight, lm_base=lm_base,
                              lm_order=lm_order, word_lm=word_lm,
                              word_count_weight=word_count_weight,
                              valid_word_count_weight=valid_word_count_weight,
                              prune_classes=prune_classes,
                              lexicon_constrained=lexicon_constrained)

        ((lengths_out, _, _, p_b, p_nb, _, lm_scores, trie_nodes, word_ctx),
         (parents, emit_chars)) = jax.lax.scan(step, state, jnp.arange(t_max))
        final = jnp.logaddexp(p_b, p_nb) + lm_scores
        if word_lm is not None:
            # Host semantics: the trailing unterminated word joins the final ranking.
            tail_bonus, _, _ = _word_bonuses(word_lm, trie_nodes, word_ctx, lm_weight,
                                             word_count_weight, valid_word_count_weight)
            final = final + tail_bonus
        if nbest:
            # Every live beam is a DISTINCT prefix (the per-step merge collapses equal
            # hashes), so the top-n final beams are an honest n-best list. Dead beams
            # (fewer than n live prefixes) are masked to empty hypotheses.
            top_scores, top_beams = jax.lax.top_k(final, nbest)
            alive = top_scores > NEG_INF / 2
            nbest_tokens, nbest_counts = jax.vmap(
                lambda beam: backtrace_tokens(parents, emit_chars, beam,
                                              lengths_out[beam], max_decoded_length)
            )(top_beams)
            nbest_tokens = jnp.where(alive[:, None], nbest_tokens, -1)
            return nbest_tokens, jnp.where(alive, nbest_counts, 0), top_scores
        best = jnp.argmax(final)

        # Backtrace the winning prefix through the (T, W) backpointers, newest first,
        # then front-compact the emitted characters in time order.
        return backtrace_tokens(parents, emit_chars, best, lengths_out[best],
                                max_decoded_length)

    if nbest:
        tokens, counts, scores = jax.vmap(decode_one)(log_probs, lengths)
        return tokens, counts.astype(jnp.int32), scores
    tokens, counts = jax.vmap(decode_one)(log_probs, lengths)
    return tokens, counts.astype(jnp.int32)


def beam_search_decode_jax(log_probs: jnp.ndarray, lengths: jnp.ndarray, blank: int,
                           beam_width: int = 25,
                           max_decoded_length: int = 256,
                           lm_table: jnp.ndarray = None,
                           lm_weight: float = 0.5,
                           word_lm=None,
                           word_count_weight: float = 0.0,
                           valid_word_count_weight: float = 2.3,
                           prune_classes: int = None,
                           lexicon_constrained: bool = False,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC prefix beam search with optional LM fusion.

    Args:
      log_probs: ``(batch, time, classes)`` log probabilities.
      lengths: ``(batch,)`` valid frame counts.
      lm_table: optional dense char-LM table (``lm/char_ngram.py``), (contexts, classes)
        log10 probs resident on device; fused with weight ``lm_weight`` on every extension.
      word_lm: optional `lm.device_lm.DeviceWordLm` — WORD-level n-gram fusion at space
        boundaries entirely on device (trie walk + hashed n-gram tables in HBM), applying
        the reference KenLM-fork weights ``lm_weight``/``word_count_weight``/
        ``valid_word_count_weight`` (`net.py:449-451`). Mutually exclusive with
        ``lm_table``.
      prune_classes: only the k most probable classes may extend a prefix per frame
        (device analog of the native decoder's probability floor; output-identical on
        peaky trained outputs, ~(C+1)/(k+1)x less merge-sort work). None = exact search.
      lexicon_constrained: with ``word_lm``, restrict the search to vocabulary words —
        character extensions must stay on the trie and spaces may only terminate
        complete vocabulary words (wav2letter's lexicon decode; the open-vocabulary
        default matches the reference's KenLM fork).
    Returns:
      ``tokens (batch, max_decoded_length) int32`` (-1 padded) and ``counts (batch,)``.
    """
    if word_lm is not None and lm_table is not None:
        raise ValueError("char-table and word-level fusion are mutually exclusive")
    if lexicon_constrained and word_lm is None:
        raise ValueError("lexicon_constrained needs a word_lm (the vocabulary trie)")
    if word_lm is not None:
        word_lm = word_lm.as_device()
        word_arrays = tuple(word_lm[:9])
        word_static = (word_lm.max_probes, word_lm.bos_id, word_lm.unk_id,
                       word_lm.space_index)
    else:
        word_arrays, word_static = None, None
    return _beam_search_impl(log_probs, lengths, blank, beam_width, max_decoded_length,
                             lm_table, lm_weight, word_arrays, word_static,
                             word_count_weight, valid_word_count_weight, prune_classes,
                             lexicon_constrained=lexicon_constrained)


def beam_search_nbest_jax(log_probs: jnp.ndarray, lengths: jnp.ndarray, blank: int,
                          nbest: int,
                          beam_width: int = 25,
                          max_decoded_length: int = 256,
                          lm_table: jnp.ndarray = None,
                          lm_weight: float = 0.5,
                          word_lm=None,
                          word_count_weight: float = 0.0,
                          valid_word_count_weight: float = 2.3,
                          prune_classes: int = None,
                          lexicon_constrained: bool = False,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """N-best variant of `beam_search_decode_jax`: the same search, returning the top-n
    final beams instead of only the winner (the reference's TF decoder exposed this as
    ``top_paths``, `net.py:438-454` / TF `ctc_beam_search_decoder`).

    Beams hold distinct prefixes by construction (per-step hash merge), so the list
    never repeats a hypothesis; when fewer than ``nbest`` prefixes are alive the tail
    entries come back empty (count 0, score ~-1e30).

    Returns ``tokens (batch, nbest, max_decoded_length)`` (-1 padded),
    ``counts (batch, nbest)``, and ``scores (batch, nbest)`` — total path score
    (acoustic log prob + weighted LM terms), descending."""
    if not 1 <= nbest <= beam_width:
        raise ValueError("nbest must be in [1, beam_width={}], got {}".format(
            beam_width, nbest))
    if word_lm is not None and lm_table is not None:
        raise ValueError("char-table and word-level fusion are mutually exclusive")
    if lexicon_constrained and word_lm is None:
        raise ValueError("lexicon_constrained needs a word_lm (the vocabulary trie)")
    if word_lm is not None:
        word_lm = word_lm.as_device()
        word_arrays = tuple(word_lm[:9])
        word_static = (word_lm.max_probes, word_lm.bos_id, word_lm.unk_id,
                       word_lm.space_index)
    else:
        word_arrays, word_static = None, None
    return _beam_search_impl(log_probs, lengths, blank, beam_width, max_decoded_length,
                             lm_table, lm_weight, word_arrays, word_static,
                             word_count_weight, valid_word_count_weight, prune_classes,
                             nbest=nbest, lexicon_constrained=lexicon_constrained)
