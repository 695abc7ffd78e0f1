"""Streaming (online) transcription: emit text while audio is still arriving.

The reference's interactive path records a complete utterance, then predicts
(`main.py:239-253` record -> predict); nothing streams. Here `StreamingTranscriber`
wraps a `serving.Transcriber` — or a `serving_export.ExportedTranscriber` whose bundle
was written with ``streaming=True`` — and decodes incrementally:

* audio accumulates in a ring buffer; each `feed()` runs the per-frame argmax program
  (`Transcriber.frame_tokens` — features + acoustic model, no collapse) over a bounded
  window and CTC-collapses (merge repeats, drop blanks) across window boundaries by
  carrying the last processed frame token;
* frames within ``margin_s`` of the right edge are never emitted — the conv stack's
  receptive field (~1.6 s for the standard 11-layer geometry) is incomplete there, so
  their decisions could still change with future audio;
* once emitted, audio older than ``margin_s`` before the emission boundary is dropped
  (aligned to the frame grid), bounding memory and per-feed compute regardless of
  stream length.

The approximation vs offline greedy decoding is only the per-window feature z-norm
(the contract normalizes over the full utterance); with multi-second windows the stats
are stable and transcripts match offline decode closely (measured in
`examples/streaming_eval.py`). A stream shorter than one window that is only flushed by
`finish()` decodes EXACTLY like the offline path.

Multi-stream serving: `StreamingSessionPool` runs many concurrent sessions over one
transcriber, with every session's window dispatches micro-batched into shared device
programs by `StreamingFrameBatcher` (one batcher thread owns all dispatch — the same
design as `serving_http.DynamicBatcher` for offline requests). Exposed over HTTP as
`POST /v1/stream` / `/v1/stream/<id>` / `/v1/stream/<id>/finish`.

Two-pass mode (``final_decode=True`` per stream/session, HTTP create body
``{"final_decode": true}``): live greedy partials flow unchanged, and `finish`
re-decodes the complete accumulated audio through the offline path — full-utterance
z-norm plus the word-LM-fused beam when the transcriber has one — returning that as
the authoritative transcript alongside the live text.
"""
import threading
import time
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from .utils.microbatch import MicroBatcher, PendingItem


class UnknownSessionError(KeyError):
    """The referenced streaming session does not exist (never created, already
    finished, or idle-reaped). Maps to HTTP 404; deliberately a distinct type so the
    handler never mistakes an internal KeyError for a missing session."""


def collapse_new_frames(frames, count: int, buffer_start: int, spf: int,
                        emit_sample: int, carry: int, emit_limit: int,
                        blank: int) -> Tuple[List[Tuple[int, int]], int, int]:
    """ONE streaming CTC emission step, shared by the host and device paths (their
    transcripts are pinned byte-identical — the rule must live in one place).

    Walks ``frames[:count]`` (per-frame argmax tokens of a window starting at
    absolute sample ``buffer_start``), skipping frames already emitted
    (< ``emit_sample``) or beyond ``emit_limit`` (the margin / flush boundary), CTC
    -collapsing against ``carry`` (the previous frame's token; repeats and blanks
    emit nothing). Returns ``(new_emissions, emit_sample, carry)`` where each
    emission is ``(token, absolute_start_sample)`` — the start carries word-level
    timing downstream.
    """
    new_emissions: List[Tuple[int, int]] = []
    for f in range(min(count, len(frames))):
        start = buffer_start + f * spf
        if start < emit_sample or start + spf > emit_limit:
            continue
        token = int(frames[f])
        if token != carry and token != blank:
            new_emissions.append((token, start))
        carry = token
        emit_sample = start + spf
    return new_emissions, emit_sample, carry


class WordAssembler:
    """Folds finalized ``(token, start_sample)`` emissions into word timestamps —
    shared by the host and device streaming sessions (single copy of the word
    boundary rule). Words close on the space grapheme or on `flush()`; times are
    absolute stream seconds: a word spans its first emitted grapheme's frame start
    to its last grapheme's frame end."""

    def __init__(self, codec, spf: int, sample_rate: int = 16000):
        self._codec = codec
        self._spf = spf
        self._rate = sample_rate
        self._chars: List[str] = []
        self._start = 0
        self._end = 0
        self._new: List[dict] = []

    def push(self, token: int, start: int) -> None:
        char = self._codec.decode_graphemes([token], merge_repeated=False)
        if char == " ":
            self._close()
            return
        if not self._chars:
            self._start = start
        self._chars.append(char)
        self._end = start + self._spf

    def flush(self) -> None:
        """Close the trailing word (stream end)."""
        self._close()

    def pop_new_words(self) -> List[dict]:
        """Words finalized since the last pop, oldest first."""
        new, self._new = self._new, []
        return new

    def _close(self) -> None:
        if self._chars:
            self._new.append({"word": "".join(self._chars),
                              "start_s": round(self._start / self._rate, 3),
                              "end_s": round(self._end / self._rate, 3)})
            self._chars = []


def offline_final_pass(transcriber, audio_parts: List[np.ndarray]) -> str:
    """The two-pass final transcript: offline decode of the full accumulated audio
    (full-utterance z-norm, silence segmentation, the LM beam when the transcriber
    has one). Shared by the host and device session implementations."""
    if not audio_parts:
        return ""
    return transcriber.transcribe_long_audio(np.concatenate(audio_parts))


def _serves_posteriors(backend) -> bool:
    """Whether ``backend`` can serve per-frame posteriors (beam partials, align):
    it exposes `frame_log_probs` AND — via the public `supports_posteriors`
    predicate both `serving.Transcriber` and `serving_export.ExportedTranscriber`
    implement — the underlying programs actually exist (a bundle exported without
    ``streaming=True`` has the method but no programs). Backends without the
    predicate are trusted if they have the method."""
    return (hasattr(backend, "frame_log_probs")
            and getattr(backend, "supports_posteriors", True))


def _check_window(window_s: float, margin_s: float) -> None:
    if window_s <= 2 * margin_s:
        raise ValueError("window_s must exceed 2*margin_s to make progress "
                         "(got window {}s, margin {}s)".format(window_s, margin_s))


def beam_decoder_for(transcriber, chunk_frames: int = 32,
                     max_decoded_length: int = 512, engine: str = "auto"):
    """Build the incremental prefix-beam decoder matching ``transcriber``'s decode
    configuration (fusion weights, word LM, lexicon constraint). The decoder is
    stateless across streams — per-stream state lives in `BeamStreamState` — so one
    instance (and its jitted step programs) serves any number of sessions.

    ``engine`` selects the device step: ``"xla"`` = the vmapped XLA beam step,
    ``"pallas"`` = the sublane-batched Pallas frame kernel
    (`ops.decode_incremental_pallas` — ~an order of magnitude less device time per
    advance at W=25, but no char-table fusion / lexicon constraint and pruned
    extensions required). ``"auto"`` picks Pallas exactly when the backend is a
    real TPU and the configuration is kernel-expressible — on CPU the kernel would
    run in interpret mode (orders of magnitude slower), so auto stays on XLA there.

    ``chunk_frames=32`` (~0.5 s at the model's 62.5 fps) matches the live-feed
    cadence: the advance program's wall is dominated by the scan LENGTH, not the
    valid rows (87 vs 135 ms per 16-wide advance at 32 vs 64 on the tunneled v5e),
    so the piece capacity should hug the typical finalized-rows-per-feed. Larger
    feeds (finish flushes over the margin) just run multiple pieces — exactness is
    piece-count-invariant (pinned in tests)."""
    from .ops.decode_incremental import BeamStreamDecoder

    if engine not in ("auto", "xla", "pallas"):
        raise ValueError("unknown beam engine {!r} (auto/xla/pallas)".format(engine))
    decoder = getattr(transcriber, "_decoder", {})
    lexicon_constrained = getattr(transcriber, "lexicon_constrained", False)
    prune_classes = decoder.get("prune_classes", None)
    if engine == "auto":
        import jax

        from .ops.device_beam import pallas_beam_supported

        classes = transcriber.blank_index + 1
        # prune_classes=None is an explicit unpruned configuration (the
        # Transcriber default is 8): the kernel requires pruned extensions, so
        # auto must stay on XLA rather than silently re-pruning the beam.
        engine = ("pallas" if jax.default_backend() == "tpu"
                  and not lexicon_constrained
                  and prune_classes is not None
                  and pallas_beam_supported(classes, prune_classes)
                  else "xla")
    if engine == "pallas":
        from .ops.decode_incremental_pallas import PallasBeamStreamDecoder

        if lexicon_constrained:
            raise ValueError("lexicon_constrained decoding is XLA-only — "
                             "use engine='xla' (or 'auto', which routes there)")
        if prune_classes is None:
            raise ValueError("the Pallas beam requires pruned extensions "
                             "(prune_classes); unpruned decoding is XLA-only — "
                             "use engine='xla' (or 'auto', which routes there)")
        cls = PallasBeamStreamDecoder
        kwargs = {"prune_classes": prune_classes}
    else:
        cls = BeamStreamDecoder
        kwargs = {"prune_classes": prune_classes,
                  "lexicon_constrained": lexicon_constrained}
    return cls(
        blank=transcriber.blank_index,
        beam_width=decoder.get("beam_width", 25),
        chunk_frames=chunk_frames,
        max_decoded_length=max_decoded_length,
        word_lm=getattr(transcriber, "word_lm", None),
        lm_weight=decoder.get("lm_weight", 0.8),
        word_count_weight=decoder.get("word_count_weight", 0.0),
        valid_word_count_weight=decoder.get("valid_word_count_weight", 2.3),
        **kwargs)


class _DeferredAdvance:
    """Handle-compatible fallback when no batcher serves pipelined advances: the
    advance runs lazily at `.wait()` (collection time) — identical lag semantics to
    the batcher path, without the overlap."""

    __slots__ = ("_fn", "_state", "_rows")

    #: Nothing progresses in the background, so the pump must never defer to a
    #: "later" that never comes: collection is always allowed.
    ready = True

    def __init__(self, fn, state, rows):
        self._fn, self._state, self._rows = fn, state, rows

    def wait(self):
        return self._fn(self._state, self._rows)


class StreamingTranscriber:
    def __init__(self, transcriber, window_s: float = 8.0, margin_s: float = 2.0,
                 sample_rate: int = 16000, frame_fn=None,
                 final_decode: bool = False, partial_decode: str = "greedy",
                 beam_chunk_frames: int = 32, beam_max_decoded_length: int = 512,
                 beam_decoder=None, beam_advance_fn=None,
                 beam_advance_nowait_fn=None):
        """``frame_fn``: optional override for the per-frame window call (defaults to
        ``transcriber.frame_tokens``, or ``transcriber.frame_log_probs`` in beam
        mode). A `StreamingFrameBatcher.submit` here lets many concurrent streams
        share batched device dispatches.

        ``beam_decoder`` / ``beam_advance_fn``: share ONE `BeamStreamDecoder` (and
        optionally a batched advance, e.g. `BeamAdvanceBatcher.submit`) across many
        beam-partial streams — the decoder holds no per-stream state (that rides in
        each stream's `BeamStreamState`), so N sessions' advances can run as one
        vmapped device dispatch instead of N. Defaults: build a private decoder and
        advance it directly.

        ``final_decode``: two-pass mode — the stream additionally accumulates every
        fed chunk on the host (~3.7 MB per minute of 16 kHz float32) and `finalize()`
        re-decodes the COMPLETE audio through the backend's offline path
        (`transcribe_long_audio`: full-utterance z-norm, silence segmentation, and
        the LM-fused beam when the transcriber has one). Live partials keep flowing
        unchanged; the second pass trades one extra offline decode at the end for the
        offline path's accuracy (no per-window normalization).

        ``partial_decode``: ``"greedy"`` (default — live partials are append-only CTC
        -collapsed argmax) or ``"beam"`` — live partials come from an INCREMENTAL
        prefix beam (`ops.decode_incremental.BeamStreamDecoder`) whose state rides
        across feeds, with the transcriber's LM fusion when it serves one. Beam
        partials are NOT append-only (later audio can re-rank the best hypothesis):
        `feed` returns the full current best transcript, which REPLACES any earlier
        partial, and `.text` is that live best. The greedy transcript (and the word
        timestamps, which are greedy-derived) stay available as `.greedy_text` /
        `pop_new_words`. Requires a transcriber with per-frame posteriors
        (`frame_log_probs` — JIT backends; AOT bundles must be exported with it)."""
        _check_window(window_s, margin_s)
        if partial_decode not in ("greedy", "beam", "beam_pipelined"):
            raise ValueError("partial_decode must be 'greedy', 'beam', or "
                             "'beam_pipelined', got {!r}".format(partial_decode))
        self._transcriber = transcriber
        self._final_decode = final_decode
        self._partial_beam = partial_decode in ("beam", "beam_pipelined")
        # Pipelined partials: feed() QUEUES the finalized rows and returns the
        # latest collected advance's best — advances run while the client gathers
        # its next chunks, so the feed critical path is the window dispatch alone.
        # Live partials lag at least one feed (more under advance backlog: a
        # session that falls behind catches up in ONE coalesced scan over the
        # queued rows, see `_pump_beam`); finish() drains everything, so the final
        # transcript is byte-identical to partial_decode="beam" (pinned in tests).
        self._beam_pipelined = partial_decode == "beam_pipelined"
        if self._partial_beam:
            if frame_fn is None and not _serves_posteriors(transcriber):
                raise ValueError(
                    "partial_decode='beam' needs per-frame posteriors; this backend "
                    "has no frame_log_probs program (bundles: re-export with "
                    "streaming=True)")
            self._beam_decoder = (beam_decoder if beam_decoder is not None
                                  else beam_decoder_for(transcriber,
                                                        beam_chunk_frames,
                                                        beam_max_decoded_length))
            self._beam_advance = (beam_advance_fn if beam_advance_fn is not None
                                  else self._beam_decoder.feed)
            if self._beam_pipelined:
                # `beam_advance_nowait_fn(state, rows)` must return a handle whose
                # `.wait()` yields `(new_state, BeamStreamResult)` — the pools pass
                # `BeamAdvanceBatcher.submit_nowait` so the advance overlaps the
                # client's next chunk; standalone streams defer to collection time.
                self._beam_submit = (
                    beam_advance_nowait_fn if beam_advance_nowait_fn is not None
                    else lambda s, r: _DeferredAdvance(self._beam_advance, s, r))
            default_fn = transcriber.frame_log_probs
        else:
            self._beam_decoder = None
            default_fn = transcriber.frame_tokens
        self._frame_fn = frame_fn if frame_fn is not None else default_fn
        spf = transcriber.samples_per_frame
        # Window/margin aligned to the output frame grid so absolute frame<->sample
        # mapping survives buffer drops.
        self._window = int(window_s * sample_rate) // spf * spf
        self._margin = int(margin_s * sample_rate) // spf * spf
        self._spf = spf
        self._sample_rate = sample_rate
        self.reset()

    def reset(self) -> None:
        self._buffer = np.zeros(0, dtype=np.float32)
        self._finished = False
        self._buffer_start = 0   # absolute sample index of buffer[0]
        self._emit_sample = 0    # everything before this absolute sample is final
        self._carry = -1         # last processed frame token (-1 = stream start)
        self._parts: List[str] = []
        self._audio_parts: List[np.ndarray] = []
        self._words = WordAssembler(self._transcriber.codec, self._spf,
                                    self._sample_rate)
        if self._partial_beam:
            self._beam_state = self._beam_decoder.init_state()
            self._beam_tokens = np.zeros(0, np.int32)
            self._beam_inflight = None  # pipelined mode's un-collected advance
            self._beam_pending = []     # finalized rows queued behind it
            self._beam_broken = False   # a failed pipelined advance breaks the stream

    @property
    def text(self) -> str:
        """The live transcript: everything emitted so far (greedy mode), or the
        incremental beam's current best hypothesis (beam mode — may be re-ranked by
        later feeds, so read it as a replacement, not an append)."""
        if self._partial_beam:
            return self._transcriber.codec.decode_graphemes(
                self._beam_tokens.tolist(), merge_repeated=False)
        return "".join(self._parts)

    @property
    def greedy_text(self) -> str:
        """The append-only greedy transcript (equal to `.text` in greedy mode; in
        beam mode the argmax partials still accumulate — they drive the word
        timestamps — and remain readable here)."""
        return "".join(self._parts)

    @property
    def final_up_to_s(self) -> float:
        """Absolute stream time (seconds) up to which the transcript is FINAL —
        everything spoken before this instant has been emitted; later audio is still
        inside the emission margin. Live-captioning clients align display on this.

        Beam mode returns 0.0 while live: beam partials carry replace semantics (any
        later feed may re-rank tokens arbitrarily far back), so NO prefix of `.text`
        is stable before `finish()`. AFTER `finish()` the whole transcript is final
        and this returns the full stream duration. The greedy emission horizon —
        which is what bounds the word timestamps — stays available as
        `greedy_final_up_to_s`."""
        if self._partial_beam:
            if self._finished:
                return (self._buffer_start + len(self._buffer)) / self._sample_rate
            return 0.0
        return self._emit_sample / self._sample_rate

    @property
    def greedy_final_up_to_s(self) -> float:
        """The greedy emission horizon (seconds): `greedy_text` and the word
        timestamps never change before this instant, in every mode."""
        return self._emit_sample / self._sample_rate

    def feed(self, chunk: np.ndarray) -> str:
        """Append audio; returns newly finalized text (possibly empty). In beam mode
        the return is the FULL current best transcript (replaces earlier partials —
        later audio can re-rank the winning hypothesis)."""
        chunk = np.asarray(chunk, np.float32)
        if self._partial_beam and getattr(self, "_beam_broken", False):
            self._collect_beam()  # raises the broken-stream error
        if self._final_decode:
            self._audio_parts.append(chunk)
        self._buffer = np.concatenate([self._buffer, chunk])
        return self._drain(flush=False)

    def finish(self) -> str:
        """Flush the stream: decode everything pending with no right margin and
        return the newly finalized text. The stream can be reused after `reset()`."""
        out = self._drain(flush=True)
        self._words.flush()
        self._finished = True
        return out

    def pop_new_words(self) -> List[dict]:
        """Word timestamps finalized since the last pop (absolute stream seconds;
        see `WordAssembler`)."""
        return self._words.pop_new_words()

    def finalize(self) -> str:
        """Two-pass final transcript: offline decode of the complete accumulated
        stream. Requires ``final_decode=True`` at construction; the live greedy
        transcript stays available as `.text`."""
        if not self._final_decode:
            raise ValueError("stream was not created with final_decode=True")
        return offline_final_pass(self._transcriber, self._audio_parts)

    def transcribe_stream(self, audio: np.ndarray, chunk_samples: int = 8000) -> str:
        """Convenience: reset, feed ``audio`` in fixed-size chunks, flush; returns the
        complete streamed transcript."""
        self.reset()
        for start in range(0, len(audio), chunk_samples):
            self.feed(audio[start:start + chunk_samples])
        # `.text` after the flush IS the complete transcript in both modes (greedy:
        # all emitted parts; beam: the final best hypothesis). Concatenating the
        # pre-flush text with finish()'s return would double the transcript in beam
        # mode, where finish returns the full re-ranked best, not a delta.
        self.finish()
        return self.text

    def _drain(self, flush: bool) -> str:
        emitted_before = len(self._parts)
        blank = self._transcriber.blank_index
        codec = self._transcriber.codec
        while True:
            available = len(self._buffer)
            window_len = min(available, self._window)
            window_end = self._buffer_start + window_len
            last_window = window_len == available
            # Frames whose receptive field may still grow are not final — except at
            # the flush of the last window, where the (possibly partial) final frame
            # is emitted too.
            emit_limit = (window_end + self._spf if flush and last_window
                          else window_end - self._margin)
            if emit_limit > self._emit_sample:
                window_out = self._frame_fn(self._buffer[:window_len])
                if self._partial_beam:
                    # Beam mode gets per-frame posteriors; the greedy machinery
                    # (emission boundary, words, greedy_text) runs on their argmax.
                    log_probs = np.asarray(window_out)
                    frames = log_probs.argmax(-1)
                else:
                    frames = window_out
                finalized_from = self._emit_sample
                emissions, self._emit_sample, self._carry = collapse_new_frames(
                    frames, len(frames), self._buffer_start, self._spf,
                    self._emit_sample, self._carry, emit_limit, blank)
                if self._partial_beam and self._emit_sample > finalized_from:
                    # Advance the carried beam over exactly the rows the greedy rule
                    # just finalized ([finalized_from, emit_sample) on the absolute
                    # sample axis — everything is frame-grid aligned by construction).
                    row_from = (finalized_from - self._buffer_start) // self._spf
                    row_to = (self._emit_sample - self._buffer_start) // self._spf
                    rows = log_probs[row_from:row_to]
                    if self._beam_pipelined:
                        # Queue the finalized rows and pump without blocking: when
                        # the previous advance has finished, its state seeds one
                        # coalesced advance over EVERYTHING queued since (feed
                        # slices arbitrary-length rows into chunk_frames pieces);
                        # when it is still in flight, the feed returns immediately
                        # and the rows ride the next pump — sessions never stall
                        # on the advance wall, they catch up in bigger scans.
                        if len(rows):
                            self._beam_pending.append(rows)
                        self._pump_beam(block=False)
                    else:
                        self._beam_state, result = self._beam_advance(
                            self._beam_state, rows)
                        self._beam_tokens = result.tokens
                if emissions:
                    self._parts.append(codec.decode_graphemes(
                        [t for t, _ in emissions], merge_repeated=False))
                    for token, start in emissions:
                        self._words.push(token, start)
            if last_window:
                break
            # More audio waits beyond this window: slide forward, dropping finalized
            # samples but keeping margin_s of left context (frame-grid aligned by
            # construction). This runs even when the window emitted nothing new, so
            # the buffer stays bounded on long silent streams.
            new_start = max(self._buffer_start, self._emit_sample - self._margin)
            if new_start == self._buffer_start:
                break  # cannot make progress without more audio (margin-bound)
            self._buffer = self._buffer[new_start - self._buffer_start:]
            self._buffer_start = new_start
        if self._partial_beam:
            if flush:
                # The flush must hand back the COMPLETE transcript: drain the
                # pipelined advance backlog (no-op in synchronous beam mode).
                self._drain_beam()
            # Beam partials replace rather than append (re-ranking): hand back the
            # full current best transcript.
            return self.text
        return "".join(self._parts[emitted_before:])

    def _pump_beam(self, block: bool) -> None:
        """Pipelined-advance pump: collect the in-flight advance when it is done
        (or unconditionally with ``block``), then submit ONE advance over every
        queued finalized-row block. `BeamStreamDecoder.feed` slices arbitrary-length
        rows into ``chunk_frames`` pieces, so a session that fell behind the
        advance wall catches up in one coalesced scan instead of serializing one
        advance per feed — partials may lag more than one feed under backlog; the
        finish drain makes the final transcript complete either way."""
        if self._beam_inflight is not None:
            # Handles without a `ready` poll (custom beam_advance_nowait_fn) are
            # collected eagerly — the pre-coalescing semantics.
            if not block and not getattr(self._beam_inflight, "ready", True):
                return
            self._collect_beam()
        if self._beam_pending:
            rows = (self._beam_pending[0] if len(self._beam_pending) == 1
                    else np.concatenate(self._beam_pending))
            self._beam_pending = []
            self._beam_inflight = self._beam_submit(self._beam_state, rows)

    def _drain_beam(self) -> None:
        """Collect and submit until no advance is in flight and no rows are queued
        — after this, `_beam_tokens`/`_beam_state` reflect every finalized frame."""
        while self._beam_inflight is not None or self._beam_pending:
            self._pump_beam(block=True)

    def _collect_beam(self) -> None:
        """Pipelined partials: wait for the in-flight advance (if any) and adopt its
        state and best hypothesis. A dispatch error surfaces here — on the feed
        AFTER the one that submitted it, or at finish — and BREAKS the stream: the
        greedy emission horizon has already moved past the failed rows, so resuming
        from the stale beam state would serve a transcript silently missing that
        audio. `reset()` (or a new session) recovers."""
        if getattr(self, "_beam_broken", False):
            raise RuntimeError("beam stream lost: a previous pipelined advance "
                               "failed mid-stream; reset() or open a new session")
        if getattr(self, "_beam_inflight", None) is not None:
            inflight, self._beam_inflight = self._beam_inflight, None
            try:
                self._beam_state, result = inflight.wait()
            except BaseException:
                self._beam_broken = True
                raise
            self._beam_tokens = result.tokens


class StreamingFrameBatcher(MicroBatcher):
    """Batch the frame-token windows of many concurrent streams into shared device
    dispatches.

    Each live stream dispatches a window every few seconds of audio; N independent
    streams would cost N dispatches (each paying the full per-dispatch latency). One
    batcher thread collects windows that arrive within ``max_wait_ms`` and serves them
    through `Transcriber.frame_tokens_batch` — the same micro-batching the offline HTTP
    path uses (`serving_http.DynamicBatcher`; queue/shutdown/error semantics shared via
    `utils.microbatch.MicroBatcher`), applied to streaming. A lone window
    short-circuits to the single-window program, so an idle service adds no latency.
    """

    item_noun = "windows"

    def __init__(self, transcriber, max_batch: int = 16, max_wait_ms: float = 20.0,
                 log_probs: bool = False):
        """``log_probs``: serve per-frame posteriors (`frame_log_probs_batch`) instead
        of argmax tokens — the window program for beam-partial streams. A pool serving
        both modes runs one batcher per mode (a dispatch can only run one program)."""
        super().__init__(max_batch=max_batch, max_wait_ms=max_wait_ms,
                         name="streaming-{}-batcher".format(
                             "posteriors" if log_probs else "frame"))
        self._transcriber = transcriber
        self._single_name = "frame_log_probs" if log_probs else "frame_tokens"

    def submit(self, audio: np.ndarray) -> np.ndarray:
        """Frame tokens (or posteriors) for one window; blocks until its batch is
        served. This is the ``frame_fn`` for `StreamingTranscriber`."""
        return super().submit(np.asarray(audio, np.float32))

    def _serve(self, batch: List[PendingItem]) -> None:
        batched = getattr(self._transcriber, self._single_name + "_batch", None)
        if len(batch) == 1 or batched is None:
            # Lone window — or a backend without the batched program (e.g. an
            # AOT bundle exported before the batched variant existed).
            single = getattr(self._transcriber, self._single_name)
            for pending in batch:
                pending.result = single(pending.payload)
        else:
            results = batched([pending.payload for pending in batch],
                              batch_size=self.max_batch)
            for pending, frames in zip(batch, results):
                pending.result = frames


class BeamAdvanceBatcher(MicroBatcher):
    """Batch the incremental-beam advances of many concurrent beam-partial streams
    into vmapped device dispatches (`BeamStreamDecoder.feed_batch`).

    Without it, N concurrent beam sessions cost N beam dispatches per chunk round —
    each paying the full per-dispatch round-trip (~24 ms on tunneled backends) — on
    top of the (already batched) window program. With it, advances that arrive
    within ``max_wait_ms`` run as ONE vmapped program with one stacked-scalars
    fetch; exactness per stream is `feed_batch`'s pinned contract. Payloads are
    ``(BeamStreamState, log_probs_rows)``, results ``(new_state, BeamStreamResult)``.
    """

    item_noun = "advances"

    def __init__(self, decoder, max_batch: int = 16, max_wait_ms: float = 20.0):
        super().__init__(max_batch=max_batch, max_wait_ms=max_wait_ms,
                         name="streaming-beam-batcher")
        self.decoder = decoder
        self._pad_state = None  # reused no-op row (never mutated: updates are pure)
        # Batch-size buckets: the vmapped program's shape depends on the batch
        # count, so free-running sizes would compile one program per distinct N
        # (minutes each on remote-compiled backends). Powers of two alone pad up to
        # 2x extra rows (a size-9 batch riding a 16-row program doubles the advance
        # compute); interleaving the 1.5x points (2,3,4,6,8,12,16,24,...) caps the
        # padding overhead at 33% for ~log2(max_batch) extra programs.
        buckets, b = [], 2
        while b < max_batch:
            buckets.append(b)
            if b + b // 2 < max_batch:
                buckets.append(b + b // 2)
            b *= 2
        self.buckets = tuple(buckets) + (max_batch,)

    def submit(self, state, log_probs):
        return super().submit((state, log_probs))

    def submit_nowait(self, state, log_probs):
        """Enqueue an advance and return its `PendingItem` (``.wait()`` →
        ``(new_state, BeamStreamResult)``) — the pipelined-partials path."""
        return self._enqueue((state, log_probs))

    def warm_up(self, classes: int) -> None:
        """Compile the advance programs for every batch size `_serve` can dispatch:
        the single-stream program (lone advances short-circuit to `decoder.feed`)
        plus the vmapped program for every bucket up to ``max_batch`` (zero-length
        no-op rows — state is untouched). A cold compile inside a live feed would
        stall every coalesced session for its duration (minutes on remote-compiled
        backends). ``classes`` is the posterior class count (``blank_index + 1``)."""
        self.decoder.feed(self.decoder.init_state(),
                          np.zeros((0, classes), np.float32))
        for bucket in self.buckets:
            self.decoder.feed_batch(
                [self.decoder.init_state()] * bucket,
                [np.zeros((0, classes), np.float32)] * bucket)

    def _serve(self, batch):
        if len(batch) == 1:
            state, rows = batch[0].payload
            batch[0].result = self.decoder.feed(state, rows)
            return
        states = [p.payload[0] for p in batch]
        rows = [np.asarray(p.payload[1], np.float32) for p in batch]
        # Pad to the next bucket: a zero-length row on a fresh state is an exact
        # no-op by feed_batch's contract, so padding rows change nothing but shape.
        bucket = next(b for b in self.buckets if b >= len(batch))
        if bucket > len(batch):
            if self._pad_state is None:
                self._pad_state = self.decoder.init_state()
            states += [self._pad_state] * (bucket - len(batch))
            rows += [np.zeros((0, rows[0].shape[1]), np.float32)] * (
                bucket - len(batch))
        results = self.decoder.feed_batch(states, rows)
        for pending, result in zip(batch, results):
            pending.result = result


class _Session:
    __slots__ = ("stream", "lock", "last_used")

    def __init__(self, stream: StreamingTranscriber):
        self.stream = stream
        self.lock = threading.Lock()
        self.last_used = time.time()


class StreamingSessionPool:
    """Many concurrent streaming sessions over ONE transcriber, their window dispatches
    micro-batched (`StreamingFrameBatcher`). The multi-stream serving surface:

        pool = StreamingSessionPool(transcriber)
        sid = pool.create()
        partial = pool.feed(sid, chunk)      # newly finalized text
        final = pool.finish(sid)             # flush + close

    Sessions idle beyond ``idle_timeout_s`` are reaped (their finalized text is lost;
    clients that want it must `finish`). Feeds to the same session serialize on a
    per-session lock; different sessions proceed concurrently and share batches.
    """

    def __init__(self, transcriber, window_s: float = 8.0, margin_s: float = 2.0,
                 max_batch: int = 16, max_wait_ms: float = 20.0,
                 idle_timeout_s: float = 300.0, max_sessions: int = 256,
                 beam_engine: str = "auto"):
        # Fail at construction, not per-request: a bad window/margin pair would
        # otherwise surface as a misleading 501 on every create().
        _check_window(window_s, margin_s)
        self._transcriber = transcriber
        self._window_s = window_s
        self._margin_s = margin_s
        self._idle_timeout_s = idle_timeout_s
        self._max_sessions = max_sessions
        self._sessions: Dict[str, _Session] = {}
        self._lock = threading.Lock()
        self.batcher = StreamingFrameBatcher(transcriber, max_batch=max_batch,
                                             max_wait_ms=max_wait_ms)
        # Beam-partial sessions dispatch a different window program (posteriors), so
        # they batch among themselves on a second batcher thread; absent the program
        # (e.g. an old AOT bundle) beam sessions are refused at create().
        self.posterior_batcher = (
            StreamingFrameBatcher(transcriber, max_batch=max_batch,
                                  max_wait_ms=max_wait_ms, log_probs=True)
            if _serves_posteriors(transcriber) else None)
        # Beam-partial sessions also share ONE BeamStreamDecoder and batch their
        # advances (`BeamAdvanceBatcher`); built lazily on the first beam create()
        # so greedy-only pools never pay for the decoder's device tables.
        self.beam_batcher: Optional[BeamAdvanceBatcher] = None
        self._beam_engine = beam_engine
        self._max_batch = max_batch
        self._max_wait_ms = max_wait_ms
        self._started = False

    def start(self) -> None:
        self.batcher.start()
        if self.posterior_batcher is not None:
            self.posterior_batcher.start()
        with self._lock:
            self._started = True
            if self.beam_batcher is not None and not self.beam_batcher.started:
                self.beam_batcher.start()

    def stop(self) -> None:
        self.batcher.stop()
        if self.posterior_batcher is not None:
            self.posterior_batcher.stop()
        if self.beam_batcher is not None:
            self.beam_batcher.stop()
        with self._lock:
            self._started = False
            self._sessions.clear()

    def create(self, final_decode: bool = False,
               partial_decode: str = "greedy") -> str:
        """``final_decode``: two-pass session — `finish` additionally re-decodes the
        complete accumulated audio through the offline path (LM beam when the
        transcriber has one) and returns that as the authoritative transcript.

        ``partial_decode``: ``"beam"`` serves live partials from the incremental
        prefix beam (see `StreamingTranscriber`); each feed's text REPLACES the
        previous partial instead of appending. ``"beam_pipelined"`` is the same
        beam at higher load capacity: advances overlap the client's next chunks
        (feed returns the latest collected advance's best — live partials lag one
        feed or more under backlog; the finish transcript is byte-identical to
        ``"beam"``)."""
        beam = partial_decode in ("beam", "beam_pipelined")
        if beam and self.posterior_batcher is None:
            raise ValueError("partial_decode='{}' needs per-frame posteriors; "
                             "this backend has no frame_log_probs program"
                             .format(partial_decode))
        with self._lock:
            self._reap_locked()
            if len(self._sessions) >= self._max_sessions:
                raise RuntimeError("session limit reached ({})".format(
                    self._max_sessions))
            session_id = uuid.uuid4().hex[:16]
            beam_kwargs = {}
            if beam:
                batcher = self._ensure_beam_batcher_locked()
                beam_kwargs = dict(
                    beam_decoder=batcher.decoder,
                    beam_advance_fn=batcher.submit,
                    beam_advance_nowait_fn=batcher.submit_nowait)
            frame_fn = (self.posterior_batcher.submit if beam
                        else self.batcher.submit)
            stream = StreamingTranscriber(self._transcriber, window_s=self._window_s,
                                          margin_s=self._margin_s,
                                          frame_fn=frame_fn,
                                          final_decode=final_decode,
                                          partial_decode=partial_decode,
                                          **beam_kwargs)
            self._sessions[session_id] = _Session(stream)
            return session_id

    def _ensure_beam_batcher_locked(self) -> BeamAdvanceBatcher:
        """Build (and start, if the pool runs) the shared beam-advance batcher.
        Caller holds `self._lock`."""
        if self.beam_batcher is None:
            self.beam_batcher = BeamAdvanceBatcher(
                beam_decoder_for(self._transcriber, engine=self._beam_engine),
                max_batch=self._max_batch, max_wait_ms=self._max_wait_ms)
            if self._started:
                self.beam_batcher.start()
        return self.beam_batcher

    def warm_up_beam(self) -> None:
        """Compile the shared beam-advance programs (the single-stream path plus
        every batch-size bucket) BEFORE beam traffic arrives: a cold compile inside
        a live feed stalls every coalesced beam session for its duration (minutes
        on remote-compiled backends). Deployments that never serve beam sessions
        skip this (and pay nothing). Raises like `create(partial_decode='beam')`
        when the backend has no posterior programs."""
        if self.posterior_batcher is None:
            raise ValueError("beam partials need per-frame posteriors; this "
                             "backend has no frame_log_probs program")
        with self._lock:
            batcher = self._ensure_beam_batcher_locked()
        batcher.warm_up(self._transcriber.blank_index + 1)

    def feed(self, session_id: str, chunk: np.ndarray) -> str:
        return self.feed_with_text(session_id, chunk)[0]

    def feed_with_text(self, session_id: str,
                       chunk: np.ndarray) -> Tuple[str, str, float]:
        """``(newly_finalized, full_text_so_far, final_up_to_s)`` — see
        `feed_with_state` for the full result."""
        state = self.feed_with_state(session_id, chunk)
        return state["partial"], state["text"], state["final_up_to_s"]

    def feed_with_state(self, session_id: str, chunk: np.ndarray) -> dict:
        """Feed one chunk; returns ``{"partial", "text", "final_up_to_s",
        "words"}`` (``words`` = word timestamps newly finalized by this feed) from
        the same locked call — a caller doing a second `text()` lookup could lose
        the result to a concurrent finish/reap."""
        session = self._get(session_id)
        with session.lock:
            try:
                partial = session.stream.feed(chunk)
                return {"partial": partial, "text": session.stream.text,
                        "final_up_to_s": session.stream.final_up_to_s,
                        "words": session.stream.pop_new_words()}
            finally:
                # Updated on exit, not entry: a first-window feed can sit in a minutes
                # -long remote compile, and entry-stamped sessions would look idle and
                # get reaped mid-feed.
                session.last_used = time.time()

    def text(self, session_id: str) -> str:
        return self._get(session_id).stream.text

    def finish(self, session_id: str) -> str:
        """Flush and close; returns the COMPLETE transcript (the offline second-pass
        decode for ``final_decode`` sessions, the live greedy text otherwise)."""
        return self.finish_with_live_text(session_id)[0]

    def finish_with_live_text(self, session_id: str) -> Tuple[str, str]:
        """``(final_text, live_text)`` — identical for single-pass sessions."""
        state = self.finish_with_state(session_id)
        return state["text"], state["live_text"]

    def finish_with_state(self, session_id: str) -> dict:
        """Flush and close; ``{"text", "live_text", "words", "final_up_to_s"}`` —
        ``words`` are the timestamps finalized by the flush (the margin's tail);
        ``final_up_to_s`` is the full stream duration (everything is final now,
        including for beam-partial sessions)."""
        session = self._get(session_id)
        with session.lock:
            session.stream.finish()
            live = session.stream.text
            full = (session.stream.finalize()
                    if session.stream._final_decode else live)
            words = session.stream.pop_new_words()
            final_up_to = session.stream.final_up_to_s
        with self._lock:
            self._sessions.pop(session_id, None)
        return {"text": full, "live_text": live, "words": words,
                "final_up_to_s": round(final_up_to, 3)}

    def close(self, session_id: str) -> None:
        with self._lock:
            self._sessions.pop(session_id, None)

    @property
    def session_count(self) -> int:
        with self._lock:
            return len(self._sessions)

    def _get(self, session_id: str) -> _Session:
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
            # stamp lands when it returns) — never reap a live stream.
            del self._sessions[stale]
