"""Network-facing inference: an HTTP transcription service with dynamic micro-batching.

The reference's serving story ends at an interactive microphone loop
(`/root/reference/main.py:77-89` record_plot_and_save + predict); a production fleet
needs a network surface. This module puts a `serving.Transcriber` (or an AOT bundle via
`serving_export.ExportedTranscriber`) behind a threaded stdlib HTTP server with a
dynamic batcher: requests that arrive within a short window are decoded through ONE
batched device program (`transcribe_batch`) instead of one dispatch each, so under
concurrent load QPS scales with the batch program's throughput rather than the
per-dispatch round-trip (~24 ms of RTT alone on a tunneled chip).

Threading contract: all device dispatch happens on the single batcher thread — HTTP
handler threads only parse the request, enqueue it, and wait on a per-request event.
JAX programs therefore never race, and a slow compile blocks the queue, not the server.

Endpoints::

    GET  /healthz                       liveness + model metadata
    GET  /v1/metrics                    request/batch counters, latency percentiles
    POST /v1/transcribe                 body: audio/wav bytes, or JSON
                                        {"pcm": [...], "sample_rate": 16000}
         ?timestamps=1                  adds word-level emission timestamps

Responses are JSON: ``{"text": ..., "confidence": ...}`` (+ ``"words"`` with
``{"word", "start_s", "end_s"}`` when timestamps are requested).
"""
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from .utils.microbatch import BatcherSaturated, MicroBatcher, PendingItem
from .utils.tools import log

_MAX_BODY_BYTES = 64 * 1024 * 1024  # ~35 min of 16 kHz float32; guards the heap


class RequestError(ValueError):
    """A client error (HTTP 4xx) with a status code."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class DynamicBatcher(MicroBatcher):
    """Collect concurrent requests into micro-batches for one device dispatch each.

    The first queued request opens a window of ``max_wait_ms``; everything that arrives
    before it closes (up to ``max_batch``) is served by a single
    ``backend.transcribe_batch`` call. A lone request short-circuits to the
    single-utterance program (no padding to the batch width), so the unloaded-latency
    path is identical to calling the transcriber directly. Queue/shutdown/error
    semantics live in `utils.microbatch.MicroBatcher` (shared with the streaming
    window batcher).
    """

    item_noun = "requests"

    def __init__(self, backend, max_batch: int = 16, max_wait_ms: float = 10.0,
                 max_queue: Optional[int] = None):
        import inspect

        super().__init__(max_batch=max_batch, max_wait_ms=max_wait_ms,
                         name="transcribe-batcher", max_queue=max_queue)
        self.backend = backend
        # The live Transcriber pads groups to an explicit batch_size — size its device
        # program to the batcher width; bundles fix the width at export time.
        try:
            parameters = inspect.signature(backend.transcribe_batch).parameters
            self._batch_kwargs = ({"batch_size": max_batch}
                                  if "batch_size" in parameters else {})
        except (TypeError, ValueError):
            self._batch_kwargs = {}

    def submit(self, audio: np.ndarray, want_timestamps: bool = False,
               nbest: Optional[int] = None) -> dict:
        """Enqueue one request and block until its batch is served."""
        return super().submit((audio, want_timestamps, nbest))

    def _serve(self, batch: List[PendingItem]) -> None:
        # N-best requests ride the same batcher thread (the module's threading
        # contract: ALL device dispatch happens here) but decode individually —
        # their program returns n hypotheses, not one row of a shared batch.
        nbest_items = [p for p in batch if p.payload[2] is not None]
        batch = [p for p in batch if p.payload[2] is None]
        for pending in nbest_items:
            audio, _, nbest = pending.payload
            try:
                hypotheses = self.backend.transcribe_nbest(audio, nbest)
                pending.result = {
                    "text": hypotheses[0][0] if hypotheses else "",
                    "hypotheses": [{"text": text, "score": round(score, 4)}
                                   for text, score in hypotheses],
                }
            except BaseException as error:  # a bad n must not poison co-batched items
                pending.error = error
        if not batch:
            return
        if len(batch) == 1:
            audio, _, _ = batch[0].payload
            text, confidence = self.backend.transcribe_audio_with_confidence(audio)
            decoded = [(text, confidence)]
        else:
            decoded = self.backend.transcribe_batch(
                [pending.payload[0] for pending in batch], **self._batch_kwargs)
        for pending, (text, confidence) in zip(batch, decoded):
            audio, want_timestamps, _ = pending.payload
            result = {"text": text, "confidence": confidence}
            if want_timestamps:
                try:
                    result["words"] = self._timestamps(audio)
                except BaseException as error:  # 501s must not poison the batch
                    pending.error = error
                    continue
            pending.result = result

    def _timestamps(self, audio: np.ndarray) -> List[dict]:
        from .serving import words_from_frame_tokens

        try:
            frames = self.backend.frame_tokens(audio)
        except ValueError as error:  # bundle exported without streaming programs
            raise RequestError(501, str(error))
        words = words_from_frame_tokens(
            frames, self.backend.codec, self.backend.blank_index,
            self.backend.samples_per_frame / 16000.0)
        return [{"word": word, "start_s": round(start, 4), "end_s": round(end, 4)}
                for word, start, end in words]


def _parse_audio(content_type: str, body: bytes) -> np.ndarray:
    """Decode a request body to a mono 16 kHz float32 waveform.

    ``audio/wav`` bodies are decoded + downmixed + polyphase-resampled; JSON bodies
    carry raw PCM floats (``{"pcm": [...], "sample_rate": 16000}``);
    ``application/octet-stream`` bodies are raw little-endian float32 mono PCM
    (``; rate=<hz>`` content-type parameter, default 16000) — the zero-parse fast
    path for latency-critical clients: `np.frombuffer` + (only if needed) one
    resample, no container walk, no JSON number parsing.
    """
    from .features.audio_io import decode_wav_bytes, resample

    kind = (content_type or "").split(";")[0].strip().lower()
    if kind == "application/octet-stream":
        if not body or len(body) % 4:
            raise RequestError(400, "octet-stream body must be non-empty raw "
                                    "little-endian float32 PCM")
        rate = 16000
        for param in (content_type or "").split(";")[1:]:
            name, _, value = param.strip().partition("=")
            if name.lower() == "rate":
                try:
                    rate = int(value)
                except ValueError:
                    raise RequestError(400, "rate parameter must be an integer")
        if rate <= 0:
            raise RequestError(400, "rate parameter must be positive")
        audio = np.frombuffer(body, dtype="<f4")
        if not np.isfinite(audio[:: max(1, audio.size // 64)]).all():
            # Spot-check (not a full pass): NaN floats would poison the shared
            # batch's features; full validation would defeat the fast path.
            raise RequestError(400, "PCM contains non-finite samples")
        return resample(audio, rate, 16000)
    if kind in ("audio/wav", "audio/x-wav", "audio/wave"):
        try:
            audio, rate = decode_wav_bytes(body)
        except Exception as error:
            raise RequestError(400, "invalid wav payload: {}".format(error))
        return resample(audio, rate, 16000)
    if kind == "application/json" or kind == "":
        try:
            payload = json.loads(body.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as error:
            raise RequestError(400, "invalid JSON body: {}".format(error))
        if not isinstance(payload, dict) or "pcm" not in payload:
            raise RequestError(400, 'JSON body must be {"pcm": [...]} '
                                    '(+ optional "sample_rate")')
        try:
            audio = np.asarray(payload["pcm"], dtype=np.float32)
        except (TypeError, ValueError) as error:
            raise RequestError(400, "pcm must be a flat float list: {}".format(error))
        if audio.ndim != 1 or audio.size == 0:
            raise RequestError(400, "pcm must be a non-empty 1-D float list")
        rate = int(payload.get("sample_rate", 16000))
        if rate <= 0:
            raise RequestError(400, "sample_rate must be positive")
        return resample(audio, rate, 16000)
    raise RequestError(415, "unsupported Content-Type {!r}; send audio/wav, "
                            "application/json, or application/octet-stream "
                            "(raw float32 PCM)".format(content_type))


class TranscriptionServer:
    """A threaded HTTP server over a transcription backend.

    ``backend`` is anything with the `serving.Transcriber` surface
    (``transcribe_audio_with_confidence``, ``transcribe_batch``, ``frame_tokens``,
    ``codec``, ``blank_index``, ``samples_per_frame``) — the live transcriber or an
    `ExportedTranscriber` bundle. Pass ``port=0`` to bind an ephemeral port
    (``server.port`` reports the bound one).
    """

    def __init__(self, backend, host: str = "127.0.0.1", port: int = 8000,
                 max_batch: int = 16, max_wait_ms: float = 10.0,
                 stream_window_s: float = 8.0, stream_margin_s: float = 2.0,
                 device_streams: bool = False, max_queue: Optional[int] = None,
                 beam_engine: str = "auto", beam_mode: str = "posterior"):
        self.backend = backend
        # Bounded backlog (default 8 dispatches deep): past it the server sheds
        # load with 503 + Retry-After instead of queueing requests into a latency
        # tail nobody will wait for. None disables shedding (unbounded queue).
        if max_queue is None:
            max_queue = 8 * max_batch
        self.batcher = DynamicBatcher(backend, max_batch=max_batch,
                                      max_wait_ms=max_wait_ms,
                                      max_queue=max_queue or None)
        # Streaming sessions (POST /v1/stream): windows of every live stream share
        # batched frame-token dispatches. Backends without the streaming surface
        # (bundles exported without frame programs) simply 501 on the routes.
        # ``device_streams=True`` keeps every session's window in HBM instead
        # (`serving_device_stream.DeviceStreamingPool` — each feed uploads only the
        # chunk, the win on bandwidth-constrained links); live backends only.
        if device_streams:
            from .serving_device_stream import DeviceStreamingPool
            self.streams = DeviceStreamingPool(backend, window_s=stream_window_s,
                                               margin_s=stream_margin_s,
                                               max_batch=max_batch,
                                               max_wait_ms=max_wait_ms,
                                               beam_engine=beam_engine,
                                               beam_mode=beam_mode)
        else:
            if beam_mode == "resident":
                raise ValueError("beam_mode='resident' needs device_streams=True "
                                 "(the beam carry lives in the pooled HBM state)")
            from .serving_streaming import StreamingSessionPool
            self.streams = StreamingSessionPool(backend, window_s=stream_window_s,
                                                margin_s=stream_margin_s,
                                                max_batch=max_batch,
                                                max_wait_ms=max_wait_ms,
                                                beam_engine=beam_engine)
        self.started_at = time.time()
        self.httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self.httpd.daemon_threads = True
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        """Start serving in a background thread (tests / embedding)."""
        self.batcher.start()
        self.streams.start()
        self._serve_thread = threading.Thread(target=self.httpd.serve_forever,
                                              daemon=True, name="transcribe-http")
        self._serve_thread.start()

    def serve_forever(self) -> None:
        """Start serving on the calling thread (the CLI path)."""
        self.batcher.start()
        self.streams.start()
        log("serving on http://{}:{} (max_batch={}, max_wait_ms={})".format(
            self.httpd.server_address[0], self.port,
            self.batcher.max_batch, self.batcher.max_wait_ms))
        try:
            self.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()
        self.streams.stop()

    def _transcribe_nbest(self, audio: np.ndarray, nbest_raw: str,
                          want_timestamps: bool) -> dict:
        """``?nbest=N``: top-N hypotheses with path scores, dispatched on the batcher
        thread like every other device program (each distinct n is its own decode
        program, so n-best items decode individually within their batch window).
        Live-checkpoint backends only — AOT bundles don't export n-best programs."""
        try:
            nbest = int(nbest_raw)
        except ValueError:
            raise RequestError(400, "nbest must be an integer")
        if nbest < 1:
            raise RequestError(400, "nbest must be >= 1")
        if want_timestamps:
            raise RequestError(400, "timestamps and nbest are mutually exclusive "
                                    "(timestamps describe the single best path)")
        if not hasattr(self.backend, "transcribe_nbest"):
            raise RequestError(501, "this backend has no n-best decode surface")
        # Cap n before anything compiles: each (n, bucket) pair is a distinct device
        # program, so an uncapped n would let any client force unbounded compiles.
        limit = getattr(self.backend, "beam_width", None)
        if limit is not None and nbest > limit:
            raise RequestError(400, "nbest must be <= the decoder's beam width ({})"
                               .format(limit))
        try:
            return self.batcher.submit(audio, nbest=nbest)
        except ValueError as error:  # e.g. nbest > beam_width on uncapped backends
            raise RequestError(400, str(error))

    def _health(self) -> dict:
        return {
            "status": "ok",
            "uptime_s": round(time.time() - self.started_at, 1),
            "charset_size": len(self.backend.codec.allowed_characters),
            "sample_buckets": list(getattr(self.backend, "sample_buckets", ())),
            "max_batch": self.batcher.max_batch,
            "streaming_sessions": self.streams.session_count,
        }

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, format, *args):  # route through our logger
                log("http {} {}".format(self.address_string(), format % args))

            def _reply(self, status: int, payload: dict,
                       headers: Optional[dict] = None) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for name, value in (headers or {}).items():
                    self.send_header(name, value)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    self._reply(200, server._health())
                elif path == "/v1/metrics":
                    metrics = server.batcher.metrics()
                    metrics["streaming"] = server.streams.batcher.metrics()
                    self._reply(200, metrics)
                else:
                    self._reply(404, {"error": "unknown path {}".format(path)})

            def _read_body(self) -> bytes:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    raise RequestError(411, "Content-Length required")
                if length > _MAX_BODY_BYTES:
                    raise RequestError(413, "body exceeds {} bytes"
                                       .format(_MAX_BODY_BYTES))
                return self.rfile.read(length)

            def _drain_body(self) -> None:
                """Read and discard any request body on routes that don't use one.

                The server speaks HTTP/1.1 (persistent connections); unread body bytes
                would be parsed as the NEXT request line on the same connection,
                breaking every keep-alive client on its second request.
                """
                length = int(self.headers.get("Content-Length", 0) or 0)
                while length > 0:
                    read = self.rfile.read(min(length, 1 << 20))
                    if not read:
                        break
                    length -= len(read)

            def do_POST(self):
                from .serving_streaming import UnknownSessionError

                parsed = urlparse(self.path)
                try:
                    if parsed.path == "/v1/transcribe":
                        audio = _parse_audio(self.headers.get("Content-Type", ""),
                                             self._read_body())
                        query = parse_qs(parsed.query)
                        want_timestamps = query.get("timestamps", ["0"])[0] in (
                            "1", "true", "yes")
                        nbest = query.get("nbest", ["1"])[0]
                        if nbest not in ("", "1"):
                            # N-best requests dispatch individually (their program
                            # returns n hypotheses, not one row of a shared batch).
                            self._reply(200, server._transcribe_nbest(
                                audio, nbest, want_timestamps))
                            return
                        self._reply(200, server.batcher.submit(audio, want_timestamps))
                    elif parsed.path == "/v1/stream":
                        # Create a streaming session. Optional JSON body:
                        # {"final_decode": true} makes finish() re-decode the full
                        # accumulated audio through the offline path (LM beam when
                        # the backend has one); {"partial_decode": "beam"} serves
                        # LIVE partials from the incremental prefix beam — each
                        # feed's "partial" then holds the full current best text and
                        # REPLACES the previous partial. The body stays OPTIONAL: a
                        # bare POST (no Content-Length) must keep working, so only
                        # read one when the client declares it.
                        has_body = int(self.headers.get("Content-Length", 0)) > 0
                        body = self._read_body() if has_body else b""
                        final_decode = False
                        partial_decode = "greedy"
                        if body.strip():
                            try:
                                options = json.loads(body)
                                final_decode = bool(
                                    options.get("final_decode", False))
                                partial_decode = str(
                                    options.get("partial_decode", "greedy"))
                            except (ValueError, AttributeError):
                                raise RequestError(400, "body must be empty or a "
                                                        "JSON object")
                        if partial_decode not in ("greedy", "beam",
                                                  "beam_pipelined"):
                            raise RequestError(400, "partial_decode must be "
                                                    "'greedy', 'beam', or "
                                                    "'beam_pipelined'")
                        try:
                            self._reply(200, {"session": server.streams.create(
                                final_decode=final_decode,
                                partial_decode=partial_decode)})
                        except ValueError as error:  # backend without the surface
                            raise RequestError(501, str(error))
                    elif parsed.path.startswith("/v1/stream/"):
                        self._stream_post(parsed.path[len("/v1/stream/"):])
                    else:
                        self._reply(404, {"error": "unknown path {}".format(
                            parsed.path)})
                except RequestError as error:
                    self._reply(error.status, {"error": str(error)})
                except BatcherSaturated as error:
                    # Saturation: shed explicitly instead of queueing into an
                    # unbounded tail; clients back off by Retry-After.
                    self._reply(503, {"error": str(error)},
                                headers={"Retry-After": str(
                                    max(1, int(round(error.retry_after_s))))})
                except UnknownSessionError as error:
                    # Scoped to the session routes' lookups; any other KeyError is a
                    # real server fault and must surface as 500 below.
                    self._reply(404, {"error": str(error)})
                except Exception as error:  # noqa: BLE001 — a serving loop must not die
                    self._reply(500, {"error": "{}: {}".format(
                        type(error).__name__, error)})

            def _stream_post(self, tail: str) -> None:
                if tail.endswith("/finish"):
                    session_id = tail[: -len("/finish")]
                    self._drain_body()
                    self._reply(200, server.streams.finish_with_state(session_id))
                    return
                # Feed one audio chunk; reply with the newly finalized text. The full
                # transcript comes from the same locked feed call — a second lookup
                # could 404 after a concurrent finish/reap and discard the result.
                session_id = tail
                audio = _parse_audio(self.headers.get("Content-Type", ""),
                                     self._read_body())
                try:
                    state = server.streams.feed_with_state(session_id, audio)
                except ValueError as error:  # backend without streaming programs
                    raise RequestError(501, str(error))
                state["final_up_to_s"] = round(state["final_up_to_s"], 3)
                self._reply(200, state)

        return Handler
