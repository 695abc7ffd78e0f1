"""Multi-stream streaming (`serving_streaming.StreamingFrameBatcher` /
`StreamingSessionPool`): batched frame-token dispatch parity, concurrent-session
transcript parity with single-stream decode, session lifecycle."""
import threading

import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_streaming import (StreamingFrameBatcher,
                                              StreamingSessionPool,
                                              StreamingTranscriber)

from test_streaming import ALPHABET, _tiny_config


@pytest.fixture(scope="module")
def transcriber():
    import jax
    config = _tiny_config()
    params = w2l.init_params(config, jax.random.PRNGKey(3))
    return Transcriber(config, params, ALPHABET, sample_buckets=(16384, 65536))


def _audios(count, seed=0, low=9000, high=60000):
    rng = np.random.RandomState(seed)
    return [(rng.randn(int(rng.randint(low, high))) * 0.3).astype(np.float32)
            for _ in range(count)]


def test_frame_tokens_batch_matches_single(transcriber):
    """Batched frame tokens == per-utterance frame tokens, across buckets and a
    padded final group."""
    audios = _audios(5)
    batched = transcriber.frame_tokens_batch(audios, batch_size=2)
    for audio, frames in zip(audios, batched):
        np.testing.assert_array_equal(frames, transcriber.frame_tokens(audio))


def test_concurrent_streams_match_sequential(transcriber):
    """N threads streaming through one shared batcher produce EXACTLY the transcripts
    of sequential unbatched streams — and their windows actually share batches."""
    audios = _audios(4, seed=7, low=30000, high=90000)
    expected = [StreamingTranscriber(transcriber, window_s=1.0, margin_s=0.25)
                .transcribe_stream(audio, chunk_samples=8000) for audio in audios]

    batcher = StreamingFrameBatcher(transcriber, max_batch=4, max_wait_ms=200.0)
    batcher.start()
    try:
        results = [None] * len(audios)

        def run(i):
            stream = StreamingTranscriber(transcriber, window_s=1.0, margin_s=0.25,
                                          frame_fn=batcher.submit)
            results[i] = stream.transcribe_stream(audios[i], chunk_samples=8000)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(audios))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        metrics = batcher.metrics()
    finally:
        batcher.stop()
    assert results == expected
    assert metrics["windows"] >= len(audios)
    # Windows from different streams shared dispatches (else batches == windows).
    assert metrics["batches"] < metrics["windows"]
    assert metrics["mean_batch_size"] > 1.0


def test_session_pool_lifecycle(transcriber):
    pool = StreamingSessionPool(transcriber, window_s=1.0, margin_s=0.25,
                                max_wait_ms=5.0)
    pool.start()
    try:
        audio = _audios(1, seed=11, low=40000, high=40001)[0]
        expected = StreamingTranscriber(transcriber, window_s=1.0, margin_s=0.25
                                        ).transcribe_stream(audio, chunk_samples=8000)
        sid = pool.create()
        assert pool.session_count == 1
        parts = [pool.feed(sid, audio[s:s + 8000])
                 for s in range(0, len(audio), 8000)]
        final = pool.finish(sid)
        assert final == expected  # finish returns the COMPLETE transcript
        assert "".join(parts) == expected[: len("".join(parts))]
        assert pool.session_count == 0
        with pytest.raises(KeyError):
            pool.feed(sid, audio[:8000])  # finished sessions are gone
    finally:
        pool.stop()


def test_session_pool_expires_idle_sessions(transcriber):
    import time

    pool = StreamingSessionPool(transcriber, window_s=1.0, margin_s=0.25,
                                idle_timeout_s=0.05)
    pool.start()
    try:
        sid = pool.create()
        time.sleep(0.1)
        with pytest.raises(KeyError):
            pool.feed(sid, np.zeros(8000, np.float32))
    finally:
        pool.stop()


def test_session_pool_enforces_limit(transcriber):
    pool = StreamingSessionPool(transcriber, max_sessions=2)
    pool.start()
    try:
        pool.create(), pool.create()
        with pytest.raises(RuntimeError, match="session limit"):
            pool.create()
    finally:
        pool.stop()


def test_batcher_stop_fails_blocked_submitters(transcriber):
    """stop() must wake submitters whose windows were never served — not leave them
    blocked forever on `done.wait()` — and reject submits after stop."""
    import time

    from speechless_tpu.utils.microbatch import BatcherStopped

    batcher = StreamingFrameBatcher(transcriber, max_batch=4, max_wait_ms=5.0)
    # Deliberately never started: submitted windows sit in the queue until stop().
    outcome = []

    def run():
        try:
            outcome.append(batcher.submit(np.zeros(9000, np.float32)))
        except BaseException as error:  # noqa: BLE001 — recording for the assert
            outcome.append(error)

    thread = threading.Thread(target=run)
    thread.start()
    time.sleep(0.05)
    batcher.stop()
    thread.join(timeout=10)
    assert not thread.is_alive(), "submitter stayed blocked after stop()"
    assert len(outcome) == 1 and isinstance(outcome[0], BatcherStopped)
    with pytest.raises(BatcherStopped):
        batcher.submit(np.zeros(9000, np.float32))


def test_pool_validates_window_margin_at_construction(transcriber):
    """A bad window/margin pair fails at construction, not as a per-create error."""
    with pytest.raises(ValueError, match="window_s"):
        StreamingSessionPool(transcriber, window_s=2.0, margin_s=1.0)


def test_reap_skips_inflight_session(transcriber):
    """A session whose feed is in flight (per-session lock held — e.g. a first-window
    feed sitting in a minutes-long remote compile) is never idle-reaped."""
    import time

    pool = StreamingSessionPool(transcriber, window_s=1.0, margin_s=0.25,
                                idle_timeout_s=0.05)
    pool.start()
    try:
        sid = pool.create()
        session = pool._sessions[sid]
        with session.lock:  # simulate a feed outliving the idle timeout
            time.sleep(0.1)
            pool.create()  # create() reaps stale sessions
            assert sid in pool._sessions, "live (locked) session was reaped"
        time.sleep(0.1)  # released and idle past the timeout -> now reapable
        pool.create()
        assert sid not in pool._sessions
    finally:
        pool.stop()


def test_feed_with_text_returns_full_transcript(transcriber):
    """feed_with_text returns (newly_finalized, full_text) from ONE locked call — the
    HTTP feed route must not do a second lookup that can lose to a concurrent
    finish/reap."""
    pool = StreamingSessionPool(transcriber, window_s=1.0, margin_s=0.25)
    pool.start()
    try:
        audio = _audios(1, seed=13, low=40000, high=40001)[0]
        sid = pool.create()
        fed = []
        last_final = 0.0
        for start in range(0, len(audio), 8000):
            partial, text, final_up_to_s = pool.feed_with_text(
                sid, audio[start:start + 8000])
            fed.append(partial)
            assert text == "".join(fed)
            assert final_up_to_s >= last_final  # monotone, frame-grid aligned
            last_final = final_up_to_s
        assert last_final <= len(audio) / 16000.0
    finally:
        pool.stop()
