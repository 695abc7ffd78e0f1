"""Incremental prefix beam search on the Pallas frame-step kernel.

`decode_incremental.BeamStreamDecoder` advances streams with the XLA beam step —
~20 small sort/scatter ops per frame per stream under `vmap`. The offline hybrid
kernel (`decode_pallas_lm.py`: Pallas candidate-expansion/merge/top-W with 8
utterances across sublanes, word-LM gathers as XLA between frames) measured ~12x
faster per frame at W=25, and its beam state rides an ordinary `lax.scan` carry —
exactly what a streaming decoder must persist between feeds. This module carries
that kernel-layout state across feeds:

* per-stream state = the kernel carry ((r,) lanes per register: pb, pnb, hash,
  last, len, lm[, trie, word-context]) plus the stitched (r, max_len) token buffer;
* a feed packs the chunk's frames (`_pack_frames`), scans the kernel body over them
  with a per-row ``t < count`` active mask (zero-count padding rows are exact
  no-ops — the coalescing batcher's bucket-padding contract), then stitches the
  token buffer from the chunk's backpointers exactly like the XLA streaming
  decoder (ancestor lane at chunk entry + within-chunk emissions);
* rollover, piece slicing, and the one-fetch-per-piece coalescing are inherited
  unchanged from `BeamStreamDecoder` — this class only swaps the device step.

Exactness: chunked-equals-offline holds by the same Markov-state argument as the
XLA decoder (the carry IS the offline scan carry), pinned in tests against
`beam_search_decode_pallas_frames`/`beam_search_decode_pallas_lm` fed the
concatenated frames, and token-level against the XLA streaming decoder at equal
``prune_classes`` (serving default 8 — `serving.py:165`). Not supported here:
char-table LM fusion and ``lexicon_constrained`` (kernel limitations — construct
the XLA decoder for those; `serving_streaming.beam_decoder_for` routes).

The reference has no streaming decode at all (`/root/reference/speechless/
main.py:239-253` records a complete utterance, then predicts); its flagship
offline decode is the KenLM-fused TF beam (`net.py:444-451`), whose fusion
weights these kernels reproduce.
"""
from functools import partial
from typing import List, Optional

import jax
import numpy as np

from .decode_incremental import BeamStreamDecoder
from .decode_pallas import FRAME_LANES, _next_pow2
from .decode_pallas_lm import (SUBLANES, _build_step, _fresh_carry,
                               _make_scan_body, _pack_frames)


@partial(
    jax.jit,
    static_argnames=("blank", "beam_width", "max_len", "lm_weight",
                     "word_lm_static", "word_count_weight",
                     "valid_word_count_weight", "prune_classes"))
def _pallas_stream_step_impl(states, log_probs, counts, blank, beam_width, max_len,
                             word_arrays, word_lm_static, lm_weight,
                             word_count_weight, valid_word_count_weight,
                             prune_classes):
    """One-chunk Pallas beam advance for N independent streams.

    ``states`` is a tuple of N per-stream kernel-layout beam tuples (see module
    docstring), ``log_probs`` ``(N, chunk, classes)``, ``counts`` ``(N,)`` valid
    frames per row (0 = exact no-op). Rows are padded to the sublane multiple
    INSIDE the program with fresh dead rows, so the kernel grid is always whole.
    Returns ``(new_states (N tuples), best rows (N, max_len), scalars (N, 3))``
    with scalars = (best length, best final score, max live length) — the same
    contract as `decode_incremental._stream_step_batch_impl`.
    """
    import jax.numpy as jnp

    n = len(states)
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)
    new_stacked, rows_best, scalars = _pallas_stream_core(
        stacked, log_probs, counts, blank, beam_width, max_len, word_arrays,
        word_lm_static, lm_weight, word_count_weight, valid_word_count_weight,
        prune_classes)
    new_states = tuple(jax.tree.map(lambda leaf, i=i: leaf[i], new_stacked)
                       for i in range(n))
    return new_states, rows_best, scalars


def _pallas_stream_core(stacked, log_probs, counts, blank, beam_width, max_len,
                        word_arrays, word_lm_static, lm_weight,
                        word_count_weight, valid_word_count_weight,
                        prune_classes):
    """`_pallas_stream_step_impl` on STACKED leaves (leading batch dim) — the
    traceable core shared with `PallasBeamStreamDecoder.advance_in_program`, which
    embeds the kernel inside the device streaming pool's resident-beam fused feed
    program. Returns ``(stacked_state, best rows (N, max_len), scalars (N, 3))``."""
    import jax.numpy as jnp

    from .decode_jax import _word_bonuses

    use_lm = word_arrays is not None
    if use_lm:
        from ..lm.device_lm import DeviceWordLm

        word_lm = DeviceWordLm(*word_arrays, *word_lm_static)
        space_index = int(word_lm_static[3])
    else:
        word_lm = None
        space_index = -2  # never matches an extension char: lm stays 0
    n, cf, class_count = log_probs.shape
    k = min(prune_classes, class_count)
    r = _next_pow2(max(beam_width, 8))
    n_pad = _next_pow2((k + 1) * r)
    b_pad = ((n + SUBLANES - 1) // SUBLANES) * SUBLANES

    core, tokens = stacked[:-1], stacked[-1]
    pad = b_pad - n
    if pad:
        fresh = _fresh_carry(pad, r, word_lm)
        core = tuple(jnp.concatenate([c, f.astype(c.dtype)], axis=0)
                     for c, f in zip(core, fresh))
        tokens = jnp.concatenate(
            [tokens, -jnp.ones((pad, r, max_len), jnp.int32)], axis=0)
    counts_pad = jnp.pad(counts.astype(jnp.int32), (0, pad))
    prev_len = core[4]                                     # (b_pad, r)

    frames_t = _pack_frames(log_probs, k, b_pad)           # (cf, b_pad, FRAME_LANES)
    step = _build_step(b_pad, r, k, n_pad, class_count, blank, beam_width,
                       max_len, space_index)
    body = _make_scan_body(step, word_lm, b_pad, r, k, counts_pad, lm_weight,
                           word_count_weight, valid_word_count_weight)
    carry, (parents, chars) = jax.lax.scan(body, core, (frames_t, jnp.arange(cf)))
    new_len = carry[4]

    # Stitch the carried token buffer (same construction as the XLA streaming
    # decoder's `_stream_step_core`): per lane, the chunk's backpointers yield the
    # ancestor lane at chunk entry plus the within-chunk emissions; the new row is
    # ``old_buffer[ancestor] ++ chunk_tokens``. Inactive frames recorded identity
    # backpointers, so zero-count rows reproduce their old buffer exactly.
    parents_b = parents.transpose(1, 0, 2)                 # (b_pad, cf, r)
    chars_b = chars.transpose(1, 0, 2)

    def stitch_row(prev_tokens_row, prev_len_row, row_parents, row_chars,
                   new_len_row):
        def stitch(lane):
            def trace(b, pointers):
                step_parents, step_chars = pointers
                return step_parents[b], step_chars[b]

            ancestor, path_chars = jax.lax.scan(trace, lane,
                                                (row_parents, row_chars),
                                                reverse=True)
            t_range = jnp.arange(cf)
            kept = path_chars >= 0
            order = jnp.argsort(jnp.where(kept, t_range, t_range + cf))
            return ancestor, path_chars[order]

        ancestors, packed = jax.vmap(stitch)(jnp.arange(r))
        entry_len = prev_len_row[ancestors]                # (r,)
        old_rows = prev_tokens_row[ancestors]              # (r, max_len)
        out = jnp.arange(max_len)[None, :]
        chunk_pos = jnp.clip(out - entry_len[:, None], 0, cf - 1)
        rows = jnp.where(out < entry_len[:, None], old_rows,
                         jnp.take_along_axis(packed, chunk_pos, axis=1))
        return jnp.where(out < new_len_row[:, None], rows, -1)

    rows_all = jax.vmap(stitch_row)(tokens, prev_len, parents_b, chars_b,
                                    new_len)               # (b_pad, r, max_len)

    # Final ranking per row — the offline kernel's ranking applied to the live
    # state (dead lanes carry pb=pnb=NEG_INF and never win).
    pb, pnb, lm = carry[0], carry[1], carry[5]
    final = jnp.logaddexp(pb, pnb) + lm
    if use_lm:
        trie, wctx = carry[6], carry[7]
        tail_bonus, _, _ = _word_bonuses(
            word_lm, trie.reshape(-1), wctx.reshape(-1, 2), lm_weight,
            word_count_weight, valid_word_count_weight)
        final = final + tail_bonus.reshape(b_pad, r)
    best = jnp.argmax(final, axis=1)                       # (b_pad,)
    rows_best = jnp.take_along_axis(
        rows_all, best[:, None, None], axis=1)[:, 0]       # (b_pad, max_len)
    best_len = jnp.take_along_axis(new_len, best[:, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    # One stacked scalar vector per row (count, score, max live length) — the
    # single-fetch-per-piece contract; float32 is exact for lengths < 2**24.
    scalars = jnp.stack([best_len.astype(jnp.float32),
                         best_score.astype(jnp.float32),
                         jnp.max(new_len, axis=1).astype(jnp.float32)], axis=1)

    new_stacked = jax.tree.map(lambda leaf: leaf[:n], carry + (rows_all,))
    return new_stacked, rows_best[:n], scalars[:n]


class PallasBeamStreamDecoder(BeamStreamDecoder):
    """`BeamStreamDecoder` with the device step on the sublane-batched Pallas beam
    kernel — same public contract (`init_state`/`feed`/`feed_batch`, rollover,
    piece slicing, coalesced fetches), ~an order of magnitude less device time per
    advance at W=25 (the offline kernel's measured margin over the XLA scan).

    Constraints (kernel limitations — `beam_decoder_for` routes to the XLA decoder
    when they bite): no char-table LM fusion, no ``lexicon_constrained``, and the
    packed frame row must hold the alphabet (``classes + 2*prune_classes <= 128``,
    checked per feed). ``prune_classes`` defaults to the serving default 8 instead
    of the XLA decoder's unpruned None.
    """

    def __init__(self, blank: int, beam_width: int = 25,
                 max_decoded_length: int = 512, chunk_frames: int = 128,
                 lm_table=None, lm_weight: float = 0.8, word_lm=None,
                 word_count_weight: float = 0.0,
                 valid_word_count_weight: float = 2.3,
                 prune_classes: Optional[int] = 8,
                 lexicon_constrained: bool = False):
        if lm_table is not None:
            raise ValueError("char-table LM fusion is XLA-only — construct "
                             "BeamStreamDecoder instead")
        if lexicon_constrained:
            raise ValueError("lexicon_constrained is XLA-only — construct "
                             "BeamStreamDecoder instead")
        if prune_classes is None:
            prune_classes = 8  # the kernel's packed row requires pruned extensions
        super().__init__(blank, beam_width=beam_width,
                         max_decoded_length=max_decoded_length,
                         chunk_frames=chunk_frames, lm_weight=lm_weight,
                         word_lm=word_lm, word_count_weight=word_count_weight,
                         valid_word_count_weight=valid_word_count_weight,
                         prune_classes=prune_classes)
        self._r = _next_pow2(max(beam_width, 8))
        if self._word_arrays is not None:
            from ..lm.device_lm import DeviceWordLm

            self._word_lm_obj = DeviceWordLm(*self._word_arrays,
                                             *self._word_static)
        else:
            self._word_lm_obj = None

    def _check_classes(self, class_count: int) -> None:
        if class_count + 2 * min(self.prune_classes, class_count) > FRAME_LANES:
            raise ValueError(
                "alphabet too large for the packed frame row ({} classes + 2*{} "
                "pruned > {} lanes) — use the XLA BeamStreamDecoder".format(
                    class_count, self.prune_classes, FRAME_LANES))

    def _fresh_beam(self) -> tuple:
        jnp = self._jnp
        carry = _fresh_carry(1, self._r, self._word_lm_obj)
        return tuple(leaf[0] for leaf in carry) + (
            -jnp.ones((self._r, self.max_decoded_length), jnp.int32),)

    def _step(self, beam: tuple, piece: np.ndarray, valid: int):
        self._check_classes(piece.shape[1])
        states, rows, scalars = self._dispatch(
            (beam,), np.asarray(piece, np.float32)[None],
            np.asarray([valid], np.int32))
        return states[0], rows[0], scalars[0]

    def _step_batch(self, beams: List[tuple], batch_lp: np.ndarray,
                    valid: np.ndarray):
        self._check_classes(batch_lp.shape[2])
        return self._dispatch(tuple(beams), batch_lp, valid)

    def _dispatch(self, states: tuple, batch_lp: np.ndarray, valid: np.ndarray):
        jnp = self._jnp
        return _pallas_stream_step_impl(
            states, jnp.asarray(batch_lp, jnp.float32),
            jnp.asarray(valid, jnp.int32), self.blank, self.beam_width,
            self.max_decoded_length, self._word_arrays, self._word_static,
            self.lm_weight, self.word_count_weight, self.valid_word_count_weight,
            self.prune_classes)

    def advance_in_program(self, stacked_state, log_probs, counts):
        """Traceable batched advance on stacked kernel-layout leaves — overrides
        the XLA base (whose `_stream_step_core` would misread this decoder's
        padded-row carry). Embeds the Pallas kernel inside the caller's program
        (the resident-beam fused feed); same contract as the base method."""
        self._check_classes(log_probs.shape[2])
        return _pallas_stream_core(
            stacked_state, log_probs, counts, self.blank, self.beam_width,
            self.max_decoded_length, self._word_arrays, self._word_static,
            self.lm_weight, self.word_count_weight, self.valid_word_count_weight,
            self.prune_classes)
