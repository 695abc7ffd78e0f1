"""Device-resident streaming: per-session audio windows live in HBM.

The host-buffered streaming path (`serving_streaming.py`) re-uploads the full decode
window (seconds of audio) on every feed; on a network-attached chip the measured
bottleneck is exactly that re-upload — 16 concurrent streams moved ~8 MB per batched
dispatch over a ~37 MB/s tunnel and both the batched and unbatched modes converged on
the link bandwidth (`evidence/STREAMING_LOAD_r03.json`). Here the window never leaves
the device:

* all sessions' windows are rows of ONE pooled HBM array (``(max_sessions+1, window)``
  float32 — the spare row absorbs batch padding writes);
* a feed uploads only the new chunk; a single fused program appends it to the session's
  row (shift quantized to the output frame grid, so absolute frame positions stay
  valid across drops exactly like the host path), scatters the updated rows back, and
  returns per-frame argmax tokens for the updated windows (plus, when
  ``beam_partials`` is on, per-frame log posteriors — beam-partial sessions run them
  through the shared incremental prefix beam, `ops/decode_incremental.py`; the
  posterior block crosses the link only for feeds of beam sessions);
* the pooled buffers/lengths are donated back to the program, so steady-state HBM
  traffic per feed is one chunk up + one token row down — the window itself never
  crosses the link again.

Emission semantics match `serving_streaming.StreamingTranscriber` (frames within
``margin_s`` of the right edge are withheld; CTC collapse carries across windows). The
one behavioral difference: the device window always keeps the *trailing* ``window_s``
of audio, which is equal-or-more left context than the host path retains after an
emission drop — the per-window z-norm therefore sees closer-to-offline statistics.
Streams shorter than one window decode identically to the host path and to offline
greedy (pinned in `tests/test_device_stream.py`).

Works from a live `serving.Transcriber` (the feed program is jitted from its config)
OR from an AOT bundle exported with ``device_streaming=...`` (`serving_export` ships
the fused feed program as serialized StableHLO; the pool dimensions — window,
chunk cap, session and batch capacity — are baked into the exported shapes, so the
pool adopts the bundle's values).

The reference has no streaming at all (its interactive path records a full utterance,
then predicts — `/root/reference/main.py:239-253`).
"""
import threading
import time
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from .serving_streaming import (BeamAdvanceBatcher, UnknownSessionError,
                                WordAssembler, _check_window, collapse_new_frames,
                                offline_final_pass)
from .utils.microbatch import MicroBatcher, PendingItem

_POISONED_MESSAGE = ("stream lost: a device dispatch failed and the pool state was "
                     "reset; create a new session")


def _build_feed_fn(config, window: int, chunk_cap: int, spf: int,
                   posteriors: bool = False, post_rows: Optional[int] = None,
                   beam_decoder=None, beam_cf: int = 32):
    """The fused append+decode program over the pooled session windows.

    ``(params, buffers (S+1, W), lengths (S+1,), rows (B,), chunks (B, cap),
    chunk_lens (B,), resets (B,)) -> (buffers, lengths, tokens (B, F), counts (B,))``

    The append shift is quantized UP to ``spf`` (the model's samples-per-output-frame)
    so every row's window start stays on the absolute frame grid — the host-side
    emission bookkeeping mirrors the same integer arithmetic.

    ``posteriors``: additionally return per-frame log posteriors for the updated
    windows — what beam-partial sessions feed the incremental prefix beam
    (`ops/decode_incremental.py`). The softmax is one extra elementwise pass over
    logits the program already computed; greedy-only pools skip it.

    ``post_rows``: slice the posterior output to a static ``(B, post_rows, classes)``
    block starting at a per-row ``post_starts`` input (extra trailing argument)
    instead of the full ``(B, F, classes)`` window. The beam advance only ever
    consumes the ~chunk-sized run of NEWLY finalized frames per feed, and
    `mirror_append` is deterministic, so the host knows the row offset BEFORE
    dispatch — the slice cuts the per-feed posterior fetch by the F/post_rows ratio
    (~12x at the 8 s window / 40-row default) and the log_softmax runs on the slice
    only. ``None`` keeps the full-window output (pre-round-5 bundles)."""
    import jax
    import jax.numpy as jnp

    from .features.spectrogram import features_batch
    from .models import wav2letter as w2l

    def update_row(buffer, length, chunk, chunk_len, reset):
        length = jnp.where(reset, 0, length)
        ext = jnp.concatenate([buffer, jnp.zeros((chunk_cap,), buffer.dtype)])
        # The chunk arrives zero-masked beyond chunk_len, so the fixed-size update
        # writes zeros over the (already zero) tail.
        ext = jax.lax.dynamic_update_slice(ext, chunk, (length,))
        total = length + chunk_len
        overflow = jnp.maximum(total - window, 0)
        shift = (overflow + spf - 1) // spf * spf
        # shift <= chunk_cap (chunk_cap is a multiple of spf and overflow <= chunk_len
        # <= chunk_cap), so the slice below never clamps — clamping would silently
        # break frame alignment.
        new_buffer = jax.lax.dynamic_slice(ext, (shift,), (window,))
        new_length = (total - shift).astype(jnp.int32)
        new_buffer = jnp.where(jnp.arange(window) < new_length, new_buffer, 0.0)
        return new_buffer, new_length

    def feed_core(params, buffers, lengths, rows, chunks, chunk_lens, resets):
        new_bufs, new_lens = jax.vmap(update_row)(
            buffers[rows], lengths[rows], chunks, chunk_lens, resets)
        buffers = buffers.at[rows].set(new_bufs)
        lengths = lengths.at[rows].set(new_lens)
        feats, frame_counts = features_batch(new_bufs, jnp.maximum(new_lens, 1))
        logits = w2l.apply(config, params, feats)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (buffers, lengths, tokens,
                w2l.prediction_lengths(config, frame_counts), new_lens), logits

    if beam_decoder is not None:
        # RESIDENT-BEAM mode: the incremental prefix beam's carry lives in pooled
        # HBM (one stacked pytree, a row per session) and advances INSIDE this
        # program over the rows the emission rule newly finalizes — no posterior
        # block, no separate advance dispatch: the per-feed link traffic is the
        # chunk up and (tokens, beam best row, 3 scalars) down, in the SAME
        # round-trip greedy pays. The separate-advance path costs ~2 extra tunnel
        # RPCs per wave (dispatch + fetch), which measured as the entire
        # beam-vs-greedy aggregate gap on tunneled backends.
        #
        # The advance row range is computed ON DEVICE from host-passed integers:
        # ``totals`` (stream samples after this feed), ``emit_samples`` (the
        # emission horizon BEFORE this feed), ``emit_limits`` (the capped
        # margin/flush boundary) — `collapse_new_frames`' qualifying set is the
        # contiguous frame range [f_lo, f_hi) and depends only on these lengths,
        # never on token content, so host and device stay in lockstep (the host
        # asserts it per feed). Sample positions ride int32: streams are bounded
        # to 2**31 samples (~37 h at 16 kHz), matching the int32 window lengths.
        fresh = beam_decoder._fresh_beam()
        max_len = beam_decoder.max_decoded_length

        def feed_fn(params, buffers, lengths, beam_state, rows, chunks,
                    chunk_lens, resets, totals, emit_samples, emit_limits,
                    beam_resets):
            out, logits = feed_core(params, buffers, lengths, rows, chunks,
                                    chunk_lens, resets)
            new_buffers, new_lengths, tokens, counts, new_lens = out
            frames = logits.shape[1]
            log_post = jax.nn.log_softmax(logits, axis=-1)
            buffer_start = totals - new_lens
            f_lo = jnp.maximum(0, (emit_samples - buffer_start) // spf)
            f_hi = jnp.minimum(counts,
                               jnp.maximum(0, (emit_limits - buffer_start) // spf))
            valid = jnp.maximum(0, f_hi - f_lo).astype(jnp.int32)
            # The static beam_cf-row block must start inside the window; when the
            # horizon rides the window tail (flush drains) the start clamps and the
            # block is rolled so the first valid row is index 0 — a plain clamped
            # dynamic_slice would silently misalign rows.
            start = jnp.clip(f_lo, 0, frames - beam_cf).astype(jnp.int32)
            shift = (f_lo - start).astype(jnp.int32)

            def slice_roll(row_post, s, sh):
                block = jax.lax.dynamic_slice(
                    row_post, (s, 0), (beam_cf, row_post.shape[-1]))
                return block[(jnp.arange(beam_cf) + sh) % beam_cf]

            blocks = jax.vmap(slice_roll)(log_post, start, shift)
            row_state = jax.tree.map(lambda pool: pool[rows], beam_state)
            row_state = jax.tree.map(
                lambda cur, fr: jnp.where(
                    beam_resets.reshape((-1,) + (1,) * (cur.ndim - 1)),
                    fr[None], cur),
                row_state, fresh)

            def run_advance(rs):
                return beam_decoder.advance_in_program(rs, blocks, valid)

            def skip_advance(rs):
                b = valid.shape[0]
                return (rs, jnp.full((b, max_len), -1, jnp.int32),
                        jnp.zeros((b, 3), jnp.float32))

            # Greedy-only dispatches skip the beam exec entirely (lax.cond on a
            # runtime scalar); sessions ignore the dummy row/scalars whenever
            # their own valid count is 0 (host recomputes it from the fetched
            # frame count), which exactly mirrors the separate-advance path's
            # "no rows finalized -> no advance" behavior.
            new_state, beam_rows, beam_scalars = jax.lax.cond(
                jnp.any(valid > 0), run_advance, skip_advance, row_state)
            beam_state = jax.tree.map(lambda pool, ns: pool.at[rows].set(ns),
                                      beam_state, new_state)
            return (new_buffers, new_lengths, beam_state, tokens, counts,
                    new_lens, beam_rows, beam_scalars)
    elif posteriors and post_rows is not None:
        def feed_fn(params, buffers, lengths, rows, chunks, chunk_lens, resets,
                    post_starts):
            out, logits = feed_core(params, buffers, lengths, rows, chunks,
                                    chunk_lens, resets)
            # Slice BEFORE the softmax: the normalization is per-frame, so the
            # sliced rows' posteriors are bit-identical to the full-window path's.
            sliced = jax.vmap(
                lambda row_logits, start: jax.lax.dynamic_slice(
                    row_logits, (start, 0),
                    (post_rows, row_logits.shape[-1])))(logits, post_starts)
            return out + (jax.nn.log_softmax(sliced, axis=-1),)
    elif posteriors:
        def feed_fn(params, buffers, lengths, rows, chunks, chunk_lens, resets):
            out, logits = feed_core(params, buffers, lengths, rows, chunks,
                                    chunk_lens, resets)
            return out + (jax.nn.log_softmax(logits, axis=-1),)
    else:
        def feed_fn(params, buffers, lengths, rows, chunks, chunk_lens, resets):
            return feed_core(params, buffers, lengths, rows, chunks, chunk_lens,
                             resets)[0]

    return feed_fn


def _window_frames(config, params, window: int) -> int:
    """The feed program's logits frame count for a full ``window``-sample row —
    abstractly traced (`jax.eval_shape`), so no device work and always exact."""
    import jax
    import jax.numpy as jnp

    from .features.spectrogram import features_batch
    from .models import wav2letter as w2l

    def f(p, wavs):
        feats, _ = features_batch(wavs, jnp.ones((1,), jnp.int32))
        return w2l.apply(config, p, feats)

    shape = jax.eval_shape(f, params,
                           jax.ShapeDtypeStruct((1, window), jnp.float32))
    return int(shape.shape[1])


def quantize_pool_dims(samples_per_frame: int, window_s: float,
                       chunk_cap_s: float) -> Tuple[int, int]:
    """``(window, chunk_cap)`` in samples, aligned to the output frame grid — the
    single place the live pool and the bundle exporter agree on shape arithmetic."""
    spf = samples_per_frame
    window = int(window_s * 16000) // spf * spf
    chunk_cap = max(int(chunk_cap_s * 16000) // spf, 1) * spf
    return window, chunk_cap


DEFAULT_POST_ROWS = 40

# Advance-range limit for non-beam rows in a resident-beam dispatch: hugely
# negative so (limit - buffer_start) // spf can never reach a valid frame, while
# staying far from int32 overflow when window-sized starts are subtracted.
_NO_EMIT_LIMIT = -(2 ** 30)


def export_feed_program(transcriber, window_s: float = 8.0,
                        chunk_cap_s: float = 1.0, max_sessions: int = 64,
                        max_batch: int = 16, posteriors: bool = False,
                        post_rows: Optional[int] = DEFAULT_POST_ROWS,
                        platforms: Optional[List[str]] = None):
    """Export the fused append+decode program for AOT bundles.

    Returns ``(exported, spec)`` where ``exported`` is the `jax.export` artifact
    (buffer/length donation preserved via the jitted function's ``donate_argnums``)
    and ``spec`` is the manifest entry `DeviceStreamingPool` reads back: the pool
    dimensions are baked into the program's static shapes, so a pool serving this
    bundle adopts them verbatim. ``posteriors`` bakes the per-frame-posterior output
    in, enabling beam-partial sessions on the bundle-backed pool; ``post_rows``
    (posterior bundles only) bakes the static sliced-posterior block size — see
    `_build_feed_fn` — and ``None`` exports the full-window posterior output.
    """
    import jax
    from jax import export as jax_export

    spf = transcriber.samples_per_frame
    window, chunk_cap = quantize_pool_dims(spf, window_s, chunk_cap_s)
    frames = _window_frames(transcriber.config, transcriber.params, window)
    if not posteriors:
        post_rows = None
    if post_rows is not None:
        post_rows = _check_post_rows(post_rows, frames)
    feed = jax.jit(_build_feed_fn(transcriber.config, window, chunk_cap, spf,
                                  posteriors=posteriors, post_rows=post_rows),
                   donate_argnums=(1, 2))
    params_shapes = jax.tree.map(
        lambda leaf: jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype),
        transcriber.params)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    arg_shapes = [
        params_shapes,
        jax.ShapeDtypeStruct((max_sessions + 1, window), np.float32),
        jax.ShapeDtypeStruct((max_sessions + 1,), np.int32),
        jax.ShapeDtypeStruct((max_batch,), np.int32),
        jax.ShapeDtypeStruct((max_batch, chunk_cap), np.float32),
        jax.ShapeDtypeStruct((max_batch,), np.int32),
        jax.ShapeDtypeStruct((max_batch,), np.bool_)]
    if post_rows is not None:
        arg_shapes.append(jax.ShapeDtypeStruct((max_batch,), np.int32))
    exported = jax_export.export(feed, **kwargs)(*arg_shapes)
    spec = {"window": window, "chunk_cap": chunk_cap,
            "max_sessions": max_sessions, "max_batch": max_batch,
            "samples_per_frame": spf, "posteriors": posteriors,
            "post_rows": post_rows, "window_frames": frames}
    return exported, spec


def _check_post_rows(post_rows: int, frames: int) -> int:
    """Validate/clamp the sliced-posterior block size: at least 12 rows, at most
    the window's frame count (the slice offset is clamped to ``frames -
    post_rows``). The slack over the per-dispatch beam piece is NOT checked here —
    ``DeviceStreamingPool.beam_piece_cap`` derives the piece cap from ``post_rows``
    (``(post_rows - 8) * spf``), so it holds by construction."""
    post_rows = int(post_rows)
    if post_rows < 12:
        raise ValueError("post_rows must be >= 12 (got {})".format(post_rows))
    return min(post_rows, frames)


def mirror_append(length: int, chunk_len: int, window: int, spf: int,
                  reset: bool = False) -> Tuple[int, int]:
    """Host mirror of the device append arithmetic: ``(new_length, shift)``. Module
    level (not a method) so tests can pin host-mirror == device-lengths directly."""
    if reset:
        length = 0
    total = length + chunk_len
    overflow = max(0, total - window)
    shift = -(-overflow // spf) * spf
    return total - shift, shift


class _DeviceFeedBatcher(MicroBatcher):
    """One thread owns the pooled device state: it collects (row, chunk) feeds from
    all sessions and serves them with one fused dispatch. Single ownership makes the
    buffer donation safe — no other thread ever holds a reference to the live arrays."""

    item_noun = "feeds"

    def __init__(self, pool: "DeviceStreamingPool", max_batch: int,
                 max_wait_ms: float):
        super().__init__(max_batch=max_batch, max_wait_ms=max_wait_ms,
                         name="device-stream-batcher")
        self._pool = pool

    def _serve(self, batch: List[PendingItem]) -> None:
        # A session's feeds serialize on its lock, so duplicate rows inside one batch
        # are impossible in normal operation — but a duplicate would make the scatter
        # order-dependent, so split defensively rather than corrupt a window.
        served: Dict[int, bool] = {}
        group: List[PendingItem] = []
        for item in batch:
            row = item.payload[0]
            if row in served:
                self._pool._dispatch(group)
                served, group = {}, []
            served[row] = True
            group.append(item)
        if group:
            self._pool._dispatch(group)


class DeviceStreamingSession:
    """Host-side mirror of one HBM-resident streaming window. Same surface as
    `serving_streaming.StreamingTranscriber`: ``feed() -> newly final text``,
    ``finish() -> remaining text``, ``.text``."""

    def __init__(self, pool: "DeviceStreamingPool", row: int,
                 final_decode: bool = False, partial_beam: bool = False,
                 beam_pipelined: bool = False):
        self._pool = pool
        self._row = row
        self._spf = pool.spf
        self._blank = pool.blank_index
        self._codec = pool.codec
        self._final_decode = final_decode
        self._partial_beam = partial_beam
        self._beam_pipelined = beam_pipelined
        self._beam_resident = partial_beam and pool.beam_mode == "resident"
        if self._beam_resident:
            # The beam carry lives in the pool's HBM state and advances inside the
            # fused feed program; the host keeps only the committed prefix (tokens
            # rolled out on buffer saturation), the fetched live best, and the
            # pending reset flag the next dispatch applies to this row.
            self._committed = np.zeros(0, np.int32)
            self._committed_score = 0.0
            self._live_tokens = np.zeros(0, np.int32)
            self._live_score = 0.0
            self._pending_beam_reset = True  # a reused row starts from fresh state
            self._beam_tokens = np.zeros(0, np.int32)
        elif partial_beam:
            # Shared jitted step program (pool-level decoder), per-session state —
            # exactly the host pool's arrangement (`serving_streaming`). Advances
            # of concurrent sessions coalesce through the pool's BeamAdvanceBatcher
            # (one vmapped dispatch for N sessions) when it is running. The
            # batcher's `started` flag is re-read per advance (`_beam_advance` /
            # `_beam_submit`), so a session created before `pool.start()` adopts
            # the coalesced/pipelined path the moment the pool starts.
            self._beam_batcher = pool._get_beam_batcher()
            self._beam_decoder = self._beam_batcher.decoder
            if beam_pipelined:
                self._beam_inflight = None
                self._beam_pending = []
            self._beam_state = self._beam_decoder.init_state()
            self._beam_tokens = np.zeros(0, np.int32)
        self._audio_parts: List[np.ndarray] = []
        self._pending_reset = True
        self._total = 0     # absolute samples fed
        self._length = 0    # mirror of the device row's valid length
        self._emit_sample = 0
        self._carry = -1
        self._parts: List[str] = []
        self._words = WordAssembler(pool.codec, pool.spf)
        self._finished = False
        self._poisoned = False
        # The session owns its lock and idle stamp (feeds serialize here whether
        # they arrive through the pool surface or this object directly) — the
        # pool's reaper reads both, so direct `create_stream()` usage is reap-safe:
        # an actively-fed session always looks busy or recently used.
        self.lock = threading.Lock()
        self.last_used = time.time()

    @property
    def text(self) -> str:
        """Live transcript: emitted greedy parts, or the incremental beam's current
        best (beam sessions — replace semantics, later audio can re-rank it)."""
        if self._partial_beam:
            return self._codec.decode_graphemes(self._beam_tokens.tolist(),
                                                merge_repeated=False)
        return "".join(self._parts)

    @property
    def greedy_text(self) -> str:
        """The append-only greedy transcript (equal to `.text` in greedy mode; in
        beam mode the argmax partials still accumulate — they drive the word
        timestamps)."""
        return "".join(self._parts)

    @property
    def final_up_to_s(self) -> float:
        """Absolute stream time (seconds) up to which the transcript is FINAL (same
        contract as `StreamingTranscriber.final_up_to_s`; 16 kHz). Beam sessions
        report 0.0 while live (replace semantics) and the full stream duration after
        `finish()`."""
        if self._partial_beam:
            return self._total / 16000.0 if self._finished else 0.0
        return self._emit_sample / 16000.0

    @property
    def greedy_final_up_to_s(self) -> float:
        """The greedy emission horizon (seconds) — bounds the word timestamps in
        every mode."""
        return self._emit_sample / 16000.0

    def feed(self, chunk: np.ndarray) -> str:
        """Upload ``chunk`` (appended to the device window) and return newly
        finalized text. Chunks larger than the pool's ``chunk_cap`` split into
        multiple dispatches transparently."""
        with self.lock:
            try:
                return self._feed_locked(chunk)
            finally:
                self.last_used = time.time()

    def feed_with_text(self, chunk: np.ndarray) -> Tuple[str, str, float]:
        """``(newly_finalized, full_text_so_far, final_up_to_s)`` — see
        `feed_with_state` for the full result."""
        state = self.feed_with_state(chunk)
        return state["partial"], state["text"], state["final_up_to_s"]

    def feed_with_state(self, chunk: np.ndarray) -> dict:
        """``{"partial", "text", "final_up_to_s", "words"}`` from one locked call
        (``words`` = word timestamps newly finalized by this feed)."""
        with self.lock:
            try:
                partial = self._feed_locked(chunk)
                return {"partial": partial, "text": self.text,
                        "final_up_to_s": self.final_up_to_s,
                        "words": self._words.pop_new_words()}
            finally:
                self.last_used = time.time()

    def _feed_locked(self, chunk: np.ndarray) -> str:
        self._check_usable()
        chunk = np.asarray(chunk, np.float32).ravel()
        if self._final_decode:
            self._audio_parts.append(chunk)
        emitted: List[str] = []
        cap = self._pool.chunk_cap
        if self._partial_beam and (self._beam_resident
                                   or self._pool.post_rows is not None):
            # Sliced posteriors / resident beam: pieces hug the static per-dispatch
            # block so a dispatch's newly finalized rows always fit it (the
            # emission cap in `_emit` is then a never-hit safety net at steady
            # state).
            cap = min(cap, self._pool.beam_piece_cap)
        for start in range(0, max(len(chunk), 1), cap):
            piece = chunk[start:start + cap]
            if len(chunk) and not len(piece):
                break
            tokens, count, log_probs, post_start = self._dispatch(piece)
            emitted.append(self._emit(tokens, count, flush=False,
                                      log_probs=log_probs, post_start=post_start))
        if self._partial_beam:
            # Beam partials replace rather than append: the full current best.
            return self.text
        return "".join(emitted)

    def finish(self) -> str:
        """Flush (decode the final margin too), free the device row, and return the
        newly finalized text."""
        with self.lock:
            try:
                return self._finish_locked()
            finally:
                self.last_used = time.time()

    def finish_with_live_text(self) -> Tuple[str, str]:
        """Flush + free the row; ``(final_text, live_text)`` — the offline second
        pass and the live greedy transcript (identical for single-pass sessions)."""
        state = self.finish_with_state()
        return state["text"], state["live_text"]

    def finish_with_state(self) -> dict:
        """Flush + free the row; ``{"text", "live_text", "words"}``."""
        with self.lock:
            self._finish_locked()
            live = self.text
            full = self._finalize_inner() if self._final_decode else live
            return {"text": full, "live_text": live,
                    "words": self._words.pop_new_words()}

    def _finish_locked(self) -> str:
        if self._poisoned:
            raise RuntimeError(_POISONED_MESSAGE)
        if self._finished:
            return ""
        out = ""
        if self._total:
            while True:
                before = self._emit_sample
                tokens, count, log_probs, post_start = self._dispatch(
                    np.zeros(0, np.float32), flush=True)
                out += self._emit(tokens, count, flush=True, log_probs=log_probs,
                                  post_start=post_start)
                if not (self._partial_beam
                        and (self._beam_resident
                             or self._pool.post_rows is not None)):
                    break
                # Sliced posteriors / resident beam: one flush dispatch drains at
                # most one advance block of the withheld margin, so loop
                # zero-length dispatches until the emission horizon catches the
                # model's frame horizon (`buffer_start + count*spf`) — typically
                # ceil(margin/block) ~= 4 extra round-trips, once per stream.
                horizon = (self._total - self._length) + count * self._spf
                if self._emit_sample <= before or self._emit_sample >= horizon:
                    break
        self._words.flush()
        self._finished = True
        self._pool._release(self._row)
        if self._partial_beam:
            return self.text  # the final re-ranked best (replace semantics)
        return out

    def finalize(self) -> str:
        """Two-pass final transcript: offline decode of the complete accumulated
        stream (same contract as `StreamingTranscriber.finalize`)."""
        with self.lock:
            return self._finalize_inner()

    def _finalize_inner(self) -> str:
        if not self._final_decode:
            raise ValueError("session was not created with final_decode=True")
        return offline_final_pass(self._pool._transcriber, self._audio_parts)

    def transcribe_stream(self, audio: np.ndarray, chunk_samples: int = 8000) -> str:
        """Convenience mirror of `StreamingTranscriber.transcribe_stream`."""
        for start in range(0, len(audio), chunk_samples):
            self.feed(audio[start:start + chunk_samples])
        # `.text` after the flush IS the complete transcript in every mode; in beam
        # modes finish() returns the FULL re-ranked best (replace semantics), so
        # concatenating it after the pre-flush text would double the transcript —
        # the same pitfall `StreamingTranscriber.transcribe_stream` documents.
        self.finish()
        return self.text

    def _check_usable(self) -> None:
        if self._poisoned:
            raise RuntimeError(_POISONED_MESSAGE)
        if self._finished:
            raise RuntimeError("session is finished")

    def _dispatch(self, piece: np.ndarray, flush: bool = False):
        mirrored, _ = mirror_append(self._length, len(piece), self._pool.window,
                                    self._spf)
        post_start = 0
        info = 0
        if self._beam_resident:
            # The fused program advances this row's HBM-resident beam over the
            # rows the emission rule will finalize — the whole range is integer
            # arithmetic over lengths (`mirror_append` is deterministic and
            # `collapse_new_frames`' horizon never depends on token content), so
            # it is computed HERE, before dispatch, and passed as scalars.
            total_after = self._total + len(piece)
            buffer_start = total_after - mirrored
            f_lo = max(0, (self._emit_sample - buffer_start) // self._spf)
            raw_limit = (total_after + self._spf if flush
                         else total_after - self._pool.margin)
            emit_limit = min(raw_limit,
                             buffer_start
                             + (f_lo + self._pool._beam_cf) * self._spf)
            info = (total_after, self._emit_sample, emit_limit,
                    self._pending_beam_reset)
        elif self._partial_beam and self._pool.post_rows is not None:
            # The slice offset is computable BEFORE dispatch: the post-append
            # buffer start is deterministic (`mirror_append`), and newly finalized
            # rows always begin at the current emission horizon. Clamped so the
            # static block stays inside the window (`dynamic_slice` would clamp
            # silently on device and misalign the host's row indexing).
            buffer_start = (self._total + len(piece)) - mirrored
            row_from = max(0, (self._emit_sample - buffer_start) // self._spf)
            post_start = max(0, min(row_from,
                                    self._pool.window_frames
                                    - self._pool.post_rows))
            info = post_start
        tokens, count, new_length, extra = self._pool.batcher.submit(
            (self._row, piece, self._pending_reset, self._partial_beam, info))
        self._pending_reset = False
        if self._beam_resident:
            self._pending_beam_reset = False
        self._total += len(piece)
        self._length = int(new_length)
        if self._length != mirrored:
            raise AssertionError(
                "device window length {} diverged from host mirror {}"
                .format(self._length, mirrored))
        return np.asarray(tokens), int(count), extra, post_start

    def _emit(self, tokens: np.ndarray, count: int, flush: bool,
              log_probs: Optional[np.ndarray] = None, post_start: int = 0) -> str:
        buffer_start = self._total - self._length  # spf-aligned by construction
        emit_limit = self._total + self._spf if flush else self._total - self._pool.margin
        if self._beam_resident:
            # Mirror of the cap `_dispatch` passed to the device — recomputed from
            # the SAME pre-advance horizon (`_emit` runs before `_emit_sample`
            # moves), so host emission and the in-program advance stay in lockstep.
            f_lo = max(0, (self._emit_sample - buffer_start) // self._spf)
            emit_limit = min(emit_limit,
                             buffer_start
                             + (f_lo + self._pool._beam_cf) * self._spf)
        elif self._partial_beam and self._pool.post_rows is not None:
            # Never finalize past the fetched posterior slice — the beam can only
            # consume rows it has. At steady state the piece cap keeps this
            # inactive; flushes drain the margin via `_finish_locked`'s loop.
            emit_limit = min(emit_limit,
                             buffer_start
                             + (post_start + self._pool.post_rows) * self._spf)
        finalized_from = self._emit_sample
        emissions, self._emit_sample, self._carry = collapse_new_frames(
            tokens, count, buffer_start, self._spf, self._emit_sample,
            self._carry, emit_limit, self._blank)
        if self._beam_resident:
            # The advance already ran inside the feed dispatch; adopt its result.
            # Lockstep assertion: the device computed its advance range with the
            # same integers — the horizon it implied must equal the one the host
            # emission rule just produced.
            f_hi = min(count, max(0, (emit_limit - buffer_start) // self._spf))
            f_lo = max(0, (finalized_from - buffer_start) // self._spf)
            expected = (buffer_start + f_hi * self._spf if f_hi > f_lo
                        else finalized_from)
            if self._emit_sample != expected:
                raise AssertionError(
                    "host emission horizon {} diverged from the device advance "
                    "range [{}, {}) (expected {})".format(
                        self._emit_sample, f_lo, f_hi, expected))
            if f_hi > f_lo and log_probs is not None:
                beam_row, scalars = log_probs
                count_live = int(scalars[0])
                self._live_tokens = np.asarray(beam_row[:count_live], np.int32)
                self._live_score = float(scalars[1])
                if (int(scalars[2]) + self._pool._beam_cf
                        > self._pool._resident_decoder.max_decoded_length):
                    # Rollover, identical to `BeamStreamDecoder.feed`'s per-piece
                    # rule: ANY live prefix could saturate within the next piece —
                    # commit the best and restart from fresh state (applied by the
                    # NEXT dispatch via the reset flag).
                    self._committed = np.concatenate(
                        [self._committed, self._live_tokens])
                    self._committed_score += self._live_score
                    self._live_tokens = np.zeros(0, np.int32)
                    self._live_score = 0.0
                    self._pending_beam_reset = True
            self._beam_tokens = (np.concatenate([self._committed,
                                                 self._live_tokens])
                                 if self._committed.size else self._live_tokens)
        elif self._partial_beam and self._emit_sample > finalized_from:
            # Advance the carried beam over exactly the rows the greedy rule just
            # finalized — identical bookkeeping to the host-window beam path
            # (`serving_streaming.StreamingTranscriber._drain`); the emitted audio
            # stays inside the trailing device window (window > margin by
            # construction), so these rows are always present in this dispatch's
            # posterior output.
            # max(0, .): if a degenerate window/margin/chunk combination ever shifts
            # unemitted audio out (the same audio the greedy rule skips), the beam
            # consumes the surviving rows rather than mis-sliced ones.
            row_from = max(0, (finalized_from - buffer_start) // self._spf)
            row_to = (self._emit_sample - buffer_start) // self._spf
            if self._pool.post_rows is not None:
                # log_probs is the static slice starting at post_start; by
                # construction post_start <= row_from and the emission cap keeps
                # row_to <= post_start + post_rows.
                rows = log_probs[row_from - post_start:row_to - post_start]
            else:
                rows = log_probs[row_from:row_to]
            if self._beam_pipelined:
                # Queue the rows and pump without blocking: a finished previous
                # advance seeds ONE coalesced advance over everything queued since
                # (`feed` slices arbitrary-length rows into chunk_frames pieces);
                # an advance still in flight lets this feed return immediately —
                # sessions never stall on the advance wall, they catch up in
                # bigger scans on the next pump.
                if len(rows):
                    self._beam_pending.append(rows)
                self._pump_beam(block=False)
            else:
                self._beam_state, result = self._beam_advance(
                    self._beam_state, rows)
                self._beam_tokens = result.tokens
        if flush and self._partial_beam and self._beam_pipelined:
            # The flush's return must be the COMPLETE transcript.
            self._drain_beam()
        if not emissions:
            return ""
        for token, start in emissions:
            self._words.push(token, start)
        part = self._codec.decode_graphemes([t for t, _ in emissions],
                                            merge_repeated=False)
        self._parts.append(part)
        return part

    def _beam_advance(self, state, rows):
        """Coalesced advance when the pool's beam batcher runs, direct otherwise —
        resolved per call (sessions created before `pool.start()` pick up the
        batcher once it starts)."""
        if self._beam_batcher.started:
            return self._beam_batcher.submit(state, rows)
        return self._beam_decoder.feed(state, rows)

    def _beam_submit(self, state, rows):
        """Pipelined submit (handle with ``.wait()``), deferring to collection time
        when no batcher thread serves advances yet."""
        from .serving_streaming import _DeferredAdvance

        if self._beam_batcher.started:
            return self._beam_batcher.submit_nowait(state, rows)
        return _DeferredAdvance(self._beam_decoder.feed, state, rows)

    def _pump_beam(self, block: bool) -> None:
        """Pipelined-advance pump — same contract as
        `serving_streaming.StreamingTranscriber._pump_beam`: collect the in-flight
        advance when done (or unconditionally with ``block``), then submit ONE
        coalesced advance over every queued finalized-row block."""
        if self._beam_inflight is not None:
            if not block and not getattr(self._beam_inflight, "ready", True):
                return
            self._collect_beam()
        if self._beam_pending:
            rows = (self._beam_pending[0] if len(self._beam_pending) == 1
                    else np.concatenate(self._beam_pending))
            self._beam_pending = []
            self._beam_inflight = self._beam_submit(self._beam_state, rows)

    def _drain_beam(self) -> None:
        while self._beam_inflight is not None or self._beam_pending:
            self._pump_beam(block=True)

    def _collect_beam(self) -> None:
        """Pipelined partials: adopt the in-flight advance's state and best (a
        dispatch error surfaces here — on the NEXT feed or at finish). A failed
        advance POISONS the session: the greedy emission horizon has already moved
        past the failed rows, so resuming from the stale beam state would serve a
        transcript silently missing that audio. The pooled HBM row is released
        immediately — a poisoned session can never feed again, and keeping the row
        until the idle reaper could transiently exhaust ``max_sessions``."""
        if getattr(self, "_beam_inflight", None) is not None:
            inflight, self._beam_inflight = self._beam_inflight, None
            try:
                self._beam_state, result = inflight.wait()
            except BaseException:
                self._poisoned = True
                if not self._finished:
                    self._finished = True
                    self._pool._release(self._row)
                raise
            self._beam_tokens = result.tokens


class DeviceStreamingPool:
    """Many concurrent streaming sessions whose windows live in pooled HBM rows.

    Drop-in alternative to `serving_streaming.StreamingSessionPool` (same public
    surface: create/feed/feed_with_text/text/finish/close/session_count/start/stop,
    ``.batcher`` metrics) — `serving_http.TranscriptionServer(device_streams=True)`
    serves it over the same HTTP routes. Per feed the link carries one chunk up and
    one token row down; the window stays on device.
    """

    def __init__(self, transcriber, window_s: float = 8.0, margin_s: float = 2.0,
                 max_batch: int = 16, max_wait_ms: float = 20.0,
                 chunk_cap_s: float = 1.0, idle_timeout_s: float = 300.0,
                 max_sessions: int = 64, beam_partials: Optional[bool] = None,
                 post_rows: Optional[int] = DEFAULT_POST_ROWS,
                 beam_engine: str = "auto", beam_mode: str = "posterior",
                 beam_opts: Optional[dict] = None):
        """``beam_partials``: let sessions opt into live BEAM partials
        (``create(partial_decode="beam")``) — the fused feed program additionally
        emits per-frame log posteriors, which beam sessions run through the shared
        incremental prefix beam (`ops/decode_incremental.BeamStreamDecoder`; state
        per session, one jitted step program for all). Default: on for live
        backends (the posterior output costs one softmax the program computes
        anyway; it only crosses the link for feeds of beam sessions), and whatever
        the bundle baked in for AOT backends.

        ``post_rows``: static size of the sliced per-feed posterior block (see
        `_build_feed_fn`) — the feed fetches only the ~chunk of newly finalized
        rows the beam advance consumes instead of the full window's, cutting beam
        feeds' link traffic ~12x at the defaults. ``None`` restores the full
        -window posterior output. AOT backends use whatever the bundle baked in.

        ``beam_engine``: the incremental-beam device step — ``"auto"`` (Pallas
        kernel on real TPUs when expressible, XLA otherwise), ``"xla"``,
        ``"pallas"`` (see `serving_streaming.beam_decoder_for`).

        ``beam_mode``: how beam-partial sessions advance. ``"posterior"`` — the
        feed program exports a posterior block and a separate coalesced advance
        dispatch runs the beam (`BeamAdvanceBatcher`; supports
        ``partial_decode="beam_pipelined"``). ``"resident"`` (live backends only)
        — the beam carry lives in pooled HBM and advances INSIDE the feed program:
        zero extra round-trips per feed, partials never lag, finish is
        byte-identical to the posterior sync beam (pinned in tests)."""
        import jax
        import jax.numpy as jnp

        from .utils.tools import log

        if beam_mode not in ("posterior", "resident"):
            raise ValueError("beam_mode must be 'posterior' or 'resident', "
                             "got {!r}".format(beam_mode))

        spec = getattr(transcriber, "device_feed_spec", None)
        if not hasattr(transcriber, "config") and spec is None:
            raise ValueError(
                "device-resident streaming needs a live serving.Transcriber or a "
                "bundle exported with device_streaming=... (this backend has "
                "neither a model config nor an exported feed program)")
        self._transcriber = transcriber
        self.codec = transcriber.codec
        self.blank_index = transcriber.blank_index
        spf = transcriber.samples_per_frame
        self.spf = spf
        if hasattr(transcriber, "config"):
            # Live backend: jit the fused feed program from the model config.
            self.beam_partials = True if beam_partials is None else beam_partials
            self.window, self.chunk_cap = quantize_pool_dims(spf, window_s,
                                                             chunk_cap_s)
            self.max_sessions = max_sessions
            self.window_frames = _window_frames(transcriber.config,
                                                transcriber.params, self.window)
            if beam_mode == "resident":
                if not self.beam_partials:
                    raise ValueError("beam_mode='resident' builds the beam into "
                                     "the feed program — it cannot be combined "
                                     "with beam_partials=False")
                from .serving_streaming import beam_decoder_for

                self.beam_mode = "resident"
                # 40 rows = DEFAULT_POST_ROWS: the piece cap (cf-8 frames of
                # slack, `beam_piece_cap`) then slices feeds exactly like the
                # sliced-posterior mode — one dispatch per ~0.5 s chunk. The
                # rollover guard scales with this block (`max_live + cf >
                # max_decoded_length`), so posterior-mode parity at the rollover
                # boundary needs matching ``chunk_frames`` on both pools.
                opts = dict(beam_opts or {})
                self._beam_cf = max(12, min(int(opts.pop("chunk_frames", 40)),
                                            self.window_frames))
                self._resident_decoder = beam_decoder_for(
                    transcriber, chunk_frames=self._beam_cf, engine=beam_engine,
                    **opts)
                self.post_rows = None
                self._beam_pool = self._resident_decoder.stacked_fresh_state(
                    max_sessions + 1)
                self._feed = jax.jit(
                    _build_feed_fn(transcriber.config, self.window,
                                   self.chunk_cap, spf,
                                   beam_decoder=self._resident_decoder,
                                   beam_cf=self._beam_cf),
                    donate_argnums=(1, 2, 3))
                self._program_posteriors = False
            else:
                self.beam_mode = "posterior"
                self._resident_decoder = None
                self.post_rows = (_check_post_rows(post_rows, self.window_frames)
                                  if self.beam_partials and post_rows is not None
                                  else None)
                self._feed = jax.jit(
                    _build_feed_fn(transcriber.config, self.window,
                                   self.chunk_cap, spf,
                                   posteriors=self.beam_partials,
                                   post_rows=self.post_rows),
                    donate_argnums=(1, 2))
                # Live backend: the program's arity follows the pool flag exactly.
                self._program_posteriors = self.beam_partials
        else:
            # AOT bundle: replay the exported feed program. The pool dimensions are
            # baked into its static shapes, so the bundle's values win over the
            # constructor's (loudly, if they differ).
            if beam_mode == "resident":
                raise ValueError(
                    "beam_mode='resident' needs a live serving.Transcriber (the "
                    "beam carry is jitted into the feed program); exported "
                    "bundles serve beam partials via beam_mode='posterior'")
            self.beam_mode = "posterior"
            self._resident_decoder = None
            requested = quantize_pool_dims(spf, window_s, chunk_cap_s)
            baked = (spec["window"], spec["chunk_cap"])
            if requested != baked or (max_sessions, max_batch) != (
                    spec["max_sessions"], spec["max_batch"]):
                log("device-stream pool adopting the bundle's baked dimensions "
                    "(window={} chunk_cap={} max_sessions={} max_batch={})".format(
                        spec["window"], spec["chunk_cap"], spec["max_sessions"],
                        spec["max_batch"]))
            self.window, self.chunk_cap = baked
            self.max_sessions = spec["max_sessions"]
            max_batch = spec["max_batch"]
            # Pre-round-5 bundles have neither key: full-window posteriors.
            self.post_rows = spec.get("post_rows")
            self.window_frames = spec.get("window_frames")
            self._feed = transcriber.device_feed_program.call
            baked_posteriors = bool(spec.get("posteriors", False))
            if beam_partials and not baked_posteriors:
                raise ValueError(
                    "beam partials need per-frame posteriors, but this bundle's "
                    "feed program was exported without them; re-export with "
                    "device_streaming={'posteriors': True}")
            self.beam_partials = (baked_posteriors if beam_partials is None
                                  else beam_partials)
            # The exported program's arity (post_starts input, posterior output) is
            # baked into its StableHLO regardless of what this pool was constructed
            # with — a posteriors bundle driven with beam_partials=False must still
            # pass/unpack the baked signature or every feed fails at dispatch.
            self._program_posteriors = baked_posteriors
        _check_window(self.window / 16000.0, margin_s)
        self.margin = int(margin_s * 16000) // spf * spf
        if self.window < self.margin + 4 * spf:
            # The window must outrun the margin by a few frames or a fast feeder
            # could shift unemitted (pre-margin) audio out of the buffer.
            raise ValueError("window too small for margin at this frame rate")
        self._idle_timeout_s = idle_timeout_s
        self._jnp = jnp
        # Row max_sessions is the padding sink: batch slots with no real feed write
        # (zeros, length 0) there, keeping every dispatch shape static.
        self._buffers = jnp.zeros((self.max_sessions + 1, self.window), jnp.float32)
        self._lengths = jnp.zeros((self.max_sessions + 1,), jnp.int32)
        self._free = list(range(self.max_sessions))
        self._sessions: Dict[str, DeviceStreamingSession] = {}
        self._lock = threading.Lock()
        self._beam_decoder = None
        self._beam_batcher = None
        self._beam_engine = beam_engine
        self._beam_opts = beam_opts
        self._beam_decoder_lock = threading.Lock()
        self.batcher = _DeviceFeedBatcher(self, max_batch=max_batch,
                                          max_wait_ms=max_wait_ms)

    # -- lifecycle ---------------------------------------------------------------

    def start(self) -> None:
        self.batcher.start()
        with self._beam_decoder_lock:
            if self._beam_batcher is not None and not self._beam_batcher.started:
                self._beam_batcher.start()

    def stop(self) -> None:
        self.batcher.stop()
        with self._beam_decoder_lock:
            if self._beam_batcher is not None:
                self._beam_batcher.stop()
        with self._lock:
            for session in self._sessions.values():
                session._poisoned = session._finished = True
            self._sessions.clear()
            self._free = list(range(self.max_sessions))

    def warm_up(self) -> None:
        """Compile the feed program before traffic (a cold compile at first feed can
        take minutes on remote-compiled backends). Feeds only the padding-sink row —
        no session row is touched."""
        if self.batcher.started:
            # Already serving: route through the batcher thread, the single owner of
            # the donated device state (a direct dispatch here would race it).
            self.batcher.submit((self.max_sessions, np.zeros(0, np.float32), True,
                                 False, 0))
        else:
            self._dispatch([])

    # -- session surface (mirrors StreamingSessionPool) ---------------------------

    def create(self, final_decode: bool = False,
               partial_decode: str = "greedy") -> str:
        """``final_decode``: two-pass session — `finish` additionally re-decodes the
        complete accumulated audio through the offline path (LM beam when the
        transcriber has one) and returns that as the authoritative transcript.

        ``partial_decode``: ``"beam"`` serves LIVE partials from the incremental
        prefix beam (`ops/decode_incremental.py`) fed by the pool program's
        per-frame posteriors — each feed's text REPLACES the previous partial.
        Requires ``beam_partials`` (on by default for live backends; bundles must
        be exported with ``device_streaming={"posteriors": True}``)."""
        if partial_decode not in ("greedy", "beam", "beam_pipelined"):
            raise ValueError("partial_decode must be 'greedy', 'beam', or "
                             "'beam_pipelined', got {!r}".format(partial_decode))
        if partial_decode == "beam_pipelined" and self.beam_mode == "resident":
            raise ValueError(
                "beam_mode='resident' pools have no separate advance to pipeline "
                "— the beam rides the feed dispatch itself; use "
                "partial_decode='beam' (partials are already lag-free)")
        beam = partial_decode in ("beam", "beam_pipelined")
        if beam and not self.beam_partials:
            if self._program_posteriors:
                raise ValueError("beam partials disabled: this pool was "
                                 "constructed with beam_partials=False (its feed "
                                 "program does export posteriors — reconstruct "
                                 "the pool with beam_partials=True)")
            raise ValueError("this pool's feed program has no posterior output; "
                             "construct with beam_partials=True (live) or re-export "
                             "the bundle with device_streaming={'posteriors': True}")
        with self._lock:
            self._reap_locked()
            if not self._free:
                raise RuntimeError(
                    "session limit reached ({})".format(self.max_sessions))
            row = self._free.pop()
            session_id = uuid.uuid4().hex[:16]
            self._sessions[session_id] = DeviceStreamingSession(
                self, row, final_decode=final_decode, partial_beam=beam,
                beam_pipelined=partial_decode == "beam_pipelined")
            return session_id

    def create_stream(self, final_decode: bool = False,
                      partial_decode: str = "greedy") -> DeviceStreamingSession:
        """Library-facing variant: returns the session object directly."""
        return self._get(self.create(final_decode=final_decode,
                                     partial_decode=partial_decode))

    def _get_beam_decoder(self):
        """The pool-wide incremental beam decoder (one jitted step program shared by
        every beam session; per-session state lives on the session). Built lazily —
        greedy-only deployments never construct it. Own lock: callers may already
        hold the pool lock (session construction inside `create`)."""
        with self._beam_decoder_lock:
            if self._beam_decoder is None:
                # One construction path for both pools: the host pool's factory
                # already extracts the fusion weights / word LM / lexicon flag and
                # carries the cadence-sized chunk_frames default.
                from .serving_streaming import beam_decoder_for

                self._beam_decoder = beam_decoder_for(self._transcriber,
                                                      engine=self._beam_engine,
                                                      **(self._beam_opts or {}))
            return self._beam_decoder

    def warm_up_beam(self) -> None:
        """Compile the shared beam-advance programs (single-stream path + every
        batch-size bucket) before beam traffic — same contract as
        `StreamingSessionPool.warm_up_beam`."""
        if self.beam_mode == "resident":
            # The advance is jitted into the feed program — `warm_up()` compiles
            # everything (both lax.cond branches compile with the program).
            self.warm_up()
            return
        if not self.beam_partials:
            raise ValueError("this pool's feed program has no posterior output; "
                             "construct with beam_partials=True (live) or re-export "
                             "the bundle with device_streaming={'posteriors': True}")
        self._get_beam_batcher().warm_up(self.blank_index + 1)

    def _get_beam_batcher(self):
        """The pool-wide `BeamAdvanceBatcher` over `_get_beam_decoder()` — advances
        of concurrent beam sessions coalesce into vmapped `feed_batch` dispatches.
        Built lazily with the decoder; started alongside the feed batcher."""
        decoder = self._get_beam_decoder()
        with self._beam_decoder_lock:
            if self._beam_batcher is None:
                self._beam_batcher = BeamAdvanceBatcher(
                    decoder, max_batch=self.batcher.max_batch,
                    max_wait_ms=self.batcher.max_wait_ms)
                if self.batcher.started:
                    self._beam_batcher.start()
            return self._beam_batcher

    def feed(self, session_id: str, chunk: np.ndarray) -> str:
        return self.feed_with_text(session_id, chunk)[0]

    def feed_with_text(self, session_id: str,
                       chunk: np.ndarray) -> Tuple[str, str, float]:
        return self._get(session_id).feed_with_text(chunk)

    def feed_with_state(self, session_id: str, chunk: np.ndarray) -> dict:
        return self._get(session_id).feed_with_state(chunk)

    def text(self, session_id: str) -> str:
        return self._get(session_id).text

    def finish(self, session_id: str) -> str:
        return self.finish_with_live_text(session_id)[0]

    def finish_with_live_text(self, session_id: str) -> Tuple[str, str]:
        """``(final_text, live_text)`` — identical for single-pass sessions."""
        state = self.finish_with_state(session_id)
        return state["text"], state["live_text"]

    def finish_with_state(self, session_id: str) -> dict:
        """Flush and close; ``{"text", "live_text", "words"}``."""
        session = self._get(session_id)
        state = session.finish_with_state()
        with self._lock:
            self._sessions.pop(session_id, None)
        return state

    def close(self, session_id: str) -> None:
        with self._lock:
            session = self._sessions.pop(session_id, None)
        if session is None:
            return
        # Under the session lock so a close racing an in-flight feed/finish cannot
        # free the row while that call's dispatch is still queued (the row would be
        # handed to a new session and receive the old session's audio).
        with session.lock:
            if not session._finished:
                session._finished = True
                self._release(session._row)

    @property
    def session_count(self) -> int:
        with self._lock:
            return len(self._sessions)

    @property
    def beam_piece_cap(self) -> int:
        """Per-dispatch piece cap (samples) for beam sessions on sliced-posterior
        pools: a few frames under ``post_rows`` so one dispatch's newly finalized
        rows (piece frames + one carry/quantization frame) always fit the static
        slice. 40 rows at the defaults → 32-frame pieces — exactly the beam
        advance's ``chunk_frames`` bucket, so a typical piece is one scan chunk.
        Resident-beam pools use the in-program advance block (``_beam_cf``, same
        40-row default) instead of ``post_rows`` — identical slicing."""
        rows = self._beam_cf if self.beam_mode == "resident" else self.post_rows
        return min(self.chunk_cap, max(4, rows - 8) * self.spf)

    # -- internals -----------------------------------------------------------------

    def _get(self, session_id: str) -> DeviceStreamingSession:
        with self._lock:
            self._reap_locked()
            session = self._sessions.get(session_id)
        if session is None:
            raise UnknownSessionError(
                "unknown or expired session {!r}".format(session_id))
        return session

    def _reap_locked(self) -> None:
        cutoff = time.time() - self._idle_timeout_s
        for stale in [sid for sid, s in self._sessions.items()
                      if s.last_used < cutoff and not s.lock.locked()]:
            # A held lock means a feed/finish is in flight right now (its last_used
            # stamp lands when it returns) — never reap a live stream. Direct
            # session objects refresh the same stamp/lock, so they are covered too.
            session = self._sessions.pop(stale)
            if not session._finished:
                session._finished = True
                # Already under self._lock (callers hold it), so free the row inline
                # rather than re-entering through _release.
                self._free.append(session._row)

    def _release(self, row: int) -> None:
        with self._lock:
            self._free.append(row)

    def _recover_after_failed_dispatch(self) -> None:
        """Rebuild fresh device state and retire every live session — their windows
        are unrecoverable once the donated arrays are gone. The failed batch's
        waiters see the original exception; later calls on old sessions raise a
        clear 'stream lost'; new sessions start clean. Runs on the batcher thread."""
        jnp = self._jnp
        self._buffers = jnp.zeros((self.max_sessions + 1, self.window), jnp.float32)
        self._lengths = jnp.zeros((self.max_sessions + 1,), jnp.int32)
        if self.beam_mode == "resident":
            # The resident beam carry was donated into the failed dispatch too.
            self._beam_pool = self._resident_decoder.stacked_fresh_state(
                self.max_sessions + 1)
        with self._lock:
            for session in self._sessions.values():
                session._poisoned = session._finished = True
            self._sessions.clear()
            self._free = list(range(self.max_sessions))

    def _dispatch(self, group: List[PendingItem]) -> None:
        """Serve one conflict-free group with a single fused device call. Runs only
        on the batcher thread (single owner of the donated device state). All
        outputs come back in ONE blocking transfer — every extra fetch is a full
        round-trip on tunneled backends."""
        import jax

        jnp = self._jnp
        batch = self.batcher.max_batch
        resident = self.beam_mode == "resident"
        rows = np.full((batch,), self.max_sessions, np.int32)  # padding sink row
        chunks = np.zeros((batch, self.chunk_cap), np.float32)
        chunk_lens = np.zeros((batch,), np.int32)
        resets = np.ones((batch,), bool)
        if resident:
            totals = np.zeros((batch,), np.int32)
            emit_samples = np.zeros((batch,), np.int32)
            # Non-beam rows must never qualify a frame for the in-program advance:
            # a hugely negative limit forces their advance range empty regardless
            # of the row's window length.
            emit_limits = np.full((batch,), _NO_EMIT_LIMIT, np.int32)
            beam_resets = np.ones((batch,), bool)
        else:
            post_starts = np.zeros((batch,), np.int32)
        any_beam = False
        for i, item in enumerate(group):
            row, piece, reset, want_beam, info = item.payload
            rows[i] = row
            chunks[i, :len(piece)] = piece
            chunk_lens[i] = len(piece)
            resets[i] = reset
            if resident:
                if want_beam:
                    (totals[i], emit_samples[i], emit_limits[i],
                     beam_resets[i]) = info
            else:
                post_starts[i] = info
            any_beam = any_beam or want_beam
        args = (self._transcriber.params, self._buffers, self._lengths)
        if resident:
            args += (self._beam_pool,)
        args += (jnp.asarray(rows), jnp.asarray(chunks), jnp.asarray(chunk_lens),
                 jnp.asarray(resets))
        if resident:
            args += (jnp.asarray(totals), jnp.asarray(emit_samples),
                     jnp.asarray(emit_limits), jnp.asarray(beam_resets))
        elif self._program_posteriors and self.post_rows is not None:
            args += (jnp.asarray(post_starts),)
        try:
            outs = self._feed(*args)
        except Exception:
            # The donated buffers/lengths may already be consumed — without
            # recovery every later feed for every session would hit deleted arrays,
            # turning one transient dispatch error (e.g. a lost tunnel RPC) into a
            # permanent streaming outage.
            self._recover_after_failed_dispatch()
            raise
        beam_rows = beam_scalars = log_probs = None
        if resident:
            (self._buffers, self._lengths, self._beam_pool, tokens, counts,
             new_lens, beam_rows, beam_scalars) = outs
            if any_beam:
                tokens, counts, new_lens, beam_rows, beam_scalars = \
                    jax.device_get((tokens, counts, new_lens, beam_rows,
                                    beam_scalars))
            else:
                tokens, counts, new_lens = jax.device_get(
                    (tokens, counts, new_lens))
                beam_rows = beam_scalars = None
        elif self._program_posteriors:
            self._buffers, self._lengths, tokens, counts, new_lens, log_probs = outs
            # The posterior block only crosses the link when a beam session is in
            # this batch (greedy-only traffic pays nothing beyond the device-side
            # softmax); one bulk fetch for the whole batch, not one per row.
            if any_beam:
                tokens, counts, new_lens, log_probs = jax.device_get(
                    (tokens, counts, new_lens, log_probs))
            else:
                tokens, counts, new_lens = jax.device_get(
                    (tokens, counts, new_lens))
                log_probs = None
        else:
            self._buffers, self._lengths, tokens, counts, new_lens = outs
            tokens, counts, new_lens = jax.device_get((tokens, counts, new_lens))
        for i, item in enumerate(group):
            extra = None
            if item.payload[3]:
                extra = ((beam_rows[i], beam_scalars[i]) if resident
                         else (log_probs[i] if log_probs is not None else None))
            item.result = (tokens[i], int(counts[i]), int(new_lens[i]), extra)
