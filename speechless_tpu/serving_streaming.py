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
"""
from typing import List

import numpy as np


class StreamingTranscriber:
    def __init__(self, transcriber, window_s: float = 8.0, margin_s: float = 2.0,
                 sample_rate: int = 16000):
        if window_s <= 2 * margin_s:
            raise ValueError("window_s must exceed 2*margin_s to make progress "
                             "(got window {}s, margin {}s)".format(window_s, margin_s))
        self._transcriber = transcriber
        spf = transcriber.samples_per_frame
        # Window/margin aligned to the output frame grid so absolute frame<->sample
        # mapping survives buffer drops.
        self._window = int(window_s * sample_rate) // spf * spf
        self._margin = int(margin_s * sample_rate) // spf * spf
        self._spf = spf
        self.reset()

    def reset(self) -> None:
        self._buffer = np.zeros(0, dtype=np.float32)
        self._buffer_start = 0   # absolute sample index of buffer[0]
        self._emit_sample = 0    # everything before this absolute sample is final
        self._carry = -1         # last processed frame token (-1 = stream start)
        self._parts: List[str] = []

    @property
    def text(self) -> str:
        """Everything emitted so far."""
        return "".join(self._parts)

    def feed(self, chunk: np.ndarray) -> str:
        """Append audio; returns newly finalized text (possibly empty)."""
        self._buffer = np.concatenate([self._buffer, np.asarray(chunk, np.float32)])
        return self._drain(flush=False)

    def finish(self) -> str:
        """Flush the stream: decode everything pending with no right margin and
        return the newly finalized text. The stream can be reused after `reset()`."""
        return self._drain(flush=True)

    def transcribe_stream(self, audio: np.ndarray, chunk_samples: int = 8000) -> str:
        """Convenience: reset, feed ``audio`` in fixed-size chunks, flush; returns the
        complete streamed transcript."""
        self.reset()
        for start in range(0, len(audio), chunk_samples):
            self.feed(audio[start:start + chunk_samples])
        return self.text + self.finish()

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
                frames = self._transcriber.frame_tokens(self._buffer[:window_len])
                new_tokens: List[int] = []
                for f, token in enumerate(frames):
                    start = self._buffer_start + f * self._spf
                    if start < self._emit_sample or start + self._spf > emit_limit:
                        continue
                    token = int(token)
                    if token != self._carry and token != blank:
                        new_tokens.append(token)
                    self._carry = token
                    self._emit_sample = start + self._spf
                if new_tokens:
                    self._parts.append(codec.decode_graphemes(new_tokens,
                                                              merge_repeated=False))
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
        return "".join(self._parts[emitted_before:])
