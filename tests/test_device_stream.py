"""Device-resident streaming (`serving_device_stream.DeviceStreamingPool`): HBM window
update arithmetic vs a numpy mirror, transcript parity with the host-buffered streaming
path and with a pure-numpy simulation, concurrency, and session lifecycle."""
import threading

import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_device_stream import (DeviceStreamingPool,
                                                  mirror_append)
from speechless_tpu.serving_streaming import (StreamingTranscriber,
                                              UnknownSessionError)

from test_streaming import ALPHABET, _tiny_config


@pytest.fixture(scope="module")
def transcriber():
    import jax
    config = _tiny_config()
    params = w2l.init_params(config, jax.random.PRNGKey(3))
    return Transcriber(config, params, ALPHABET, sample_buckets=(16384, 65536))


@pytest.fixture()
def pool(transcriber):
    # window_s=1.024 makes the pooled window exactly the 16384-sample bucket, so the
    # pooled program and the single-utterance reference program run the SAME padded
    # shape: XLA's reductions differ by ~1e-6 across padded shapes, enough to flip
    # borderline argmaxes over a long stream — with equal shapes parity is exact.
    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=4, max_wait_ms=20.0, chunk_cap_s=0.5,
                               max_sessions=4)
    pool.start()
    yield pool
    pool.stop()


def _audio(samples, seed=0):
    return (np.random.RandomState(seed).randn(samples) * 0.3).astype(np.float32)


def test_device_window_matches_numpy_mirror(transcriber, pool):
    """After arbitrary-size feeds the device row holds exactly the trailing window the
    host mirror arithmetic predicts (content and length), with the start frame-aligned."""
    session = pool.create_stream()
    spf = pool.spf
    fed = np.zeros(0, np.float32)
    length = 0
    rng = np.random.RandomState(1)
    for i in range(7):
        chunk = _audio(int(rng.randint(100, pool.chunk_cap + 1)), seed=10 + i)
        session.feed(chunk)
        fed = np.concatenate([fed, chunk])
        length, _ = mirror_append(length, len(chunk), pool.window, spf)
    assert session._length == length
    assert (len(fed) - length) % spf == 0  # window start stays on the frame grid
    row = np.asarray(pool._buffers[session._row])
    np.testing.assert_array_equal(row[:length], fed[len(fed) - length:])
    np.testing.assert_array_equal(row[length:], 0.0)
    session.finish()


def test_short_stream_matches_host_streaming_and_flush_exactness(transcriber, pool):
    """A stream shorter than one window decodes exactly like the host-buffered path
    (which in turn decodes exactly like offline greedy on flush)."""
    audio = _audio(12000, seed=2)  # < one window
    host = StreamingTranscriber(transcriber, window_s=1.024, margin_s=0.25)
    expected = host.transcribe_stream(audio, chunk_samples=4000)
    session = pool.create_stream()
    assert session.transcribe_stream(audio, chunk_samples=4000) == expected


def test_long_stream_matches_numpy_simulation(transcriber, pool):
    """Long streams (window slides/shifts) decode exactly like a pure-numpy simulation
    of the device-window semantics: trailing-window buffer + the same frame-aligned
    shift + the same margin/carry emission rules."""
    audio = _audio(60000, seed=3)
    chunk_samples = 4000
    spf = pool.spf
    window, margin = pool.window, pool.margin
    codec, blank = pool.codec, pool.blank_index

    buffer = np.zeros(0, np.float32)
    total = 0
    length = 0
    emit_sample, carry = 0, -1
    parts = []

    def emit(frames, count, flush):
        nonlocal emit_sample, carry
        buffer_start = total - length
        emit_limit = total + spf if flush else total - margin
        new_tokens = []
        for f in range(min(count, len(frames))):
            start = buffer_start + f * spf
            if start < emit_sample or start + spf > emit_limit:
                continue
            token = int(frames[f])
            if token != carry and token != blank:
                new_tokens.append(token)
            carry = token
            emit_sample = start + spf
        if new_tokens:
            parts.append(codec.decode_graphemes(new_tokens, merge_repeated=False))

    for start in range(0, len(audio), chunk_samples):
        chunk = audio[start:start + chunk_samples]
        new_length, _ = mirror_append(length, len(chunk), window, spf)
        buffer = np.concatenate([buffer, chunk])[-new_length:]
        total += len(chunk)
        length = new_length
        frames = transcriber.frame_tokens(buffer)
        emit(frames, len(frames), flush=False)
    frames = transcriber.frame_tokens(buffer)
    emit(frames, len(frames), flush=True)
    expected = "".join(parts)

    session = pool.create_stream()
    assert session.transcribe_stream(audio, chunk_samples=chunk_samples) == expected


def test_oversized_chunk_splits_transparently(transcriber, pool):
    """One feed larger than chunk_cap produces the same transcript as cap-sized
    feeds."""
    audio = _audio(3 * pool.chunk_cap + 517, seed=4)
    via_big = pool.create_stream()
    big_text = via_big.feed(audio) + via_big.finish()
    via_small = pool.create_stream()
    small_parts = [via_small.feed(audio[s:s + pool.chunk_cap])
                   for s in range(0, len(audio), pool.chunk_cap)]
    assert big_text == "".join(small_parts) + via_small.finish()


def test_concurrent_sessions_match_sequential(transcriber, pool):
    """N threads feeding one pool share fused dispatches and still produce exactly
    the sequential per-session transcripts."""
    audios = [_audio(int(n), seed=20 + i)
              for i, n in enumerate((30000, 45000, 52000, 38000))]
    expected = [pool.create_stream().transcribe_stream(a, 4000) for a in audios]

    results = [None] * len(audios)

    def run(i):
        results[i] = pool.create_stream().transcribe_stream(audios[i], 4000)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(audios))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == expected
    assert pool.batcher.batches < pool.batcher.items  # some feeds actually batched


def test_concurrent_beam_sessions_batch_advances_and_match_sequential(transcriber,
                                                                      pool):
    """N threads' BEAM sessions coalesce their incremental-beam advances through the
    pool's shared `BeamAdvanceBatcher` (vmapped `feed_batch`) and still produce
    exactly the sequential per-session transcripts."""
    audios = [_audio(int(n), seed=30 + i)
              for i, n in enumerate((30000, 45000, 52000, 38000))]

    def transcribe(audio):
        session = pool.create_stream(partial_decode="beam")
        session.transcribe_stream(audio, 4000)
        return session.text

    expected = [transcribe(a) for a in audios]
    results = [None] * len(audios)

    def run(i):
        results[i] = transcribe(audios[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(audios))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == expected
    metrics = pool._beam_batcher.metrics()
    assert metrics["advances"] > 0
    assert metrics["batches"] < metrics["advances"]  # advances actually coalesced


def test_row_reuse_resets_device_state(transcriber, pool):
    """finish() frees the HBM row; a new session on the reused row must not see stale
    audio."""
    audio = _audio(20000, seed=5)
    first = pool.create_stream()
    first_text = first.transcribe_stream(audio, 4000)
    again = pool.create_stream()
    assert again._row == first._row  # LIFO free list: the same HBM row comes back
    assert again.transcribe_stream(audio, 4000) == first_text


def test_session_pool_surface(transcriber, pool):
    sid = pool.create()
    partial, text, final_up_to_s = pool.feed_with_text(sid, _audio(9000, seed=6))
    assert text.endswith(partial)
    assert pool.text(sid) == text
    assert 0.0 <= final_up_to_s <= 9000 / 16000.0  # final time never outruns audio
    full = pool.finish(sid)
    assert full.startswith(text)
    with pytest.raises(UnknownSessionError):
        pool.feed(sid, _audio(100))
    with pytest.raises(UnknownSessionError):
        pool.finish("nope")


def test_session_limit(transcriber, pool):
    sids = [pool.create() for _ in range(pool.max_sessions)]
    with pytest.raises(RuntimeError, match="session limit"):
        pool.create()
    for sid in sids:
        pool.close(sid)
    pool.create()


def test_backend_without_feed_program_rejected():
    class FakeBundle:
        pass

    with pytest.raises(ValueError, match="live serving.Transcriber"):
        DeviceStreamingPool(FakeBundle())


def test_exported_bundle_serves_device_streams(transcriber, pool, tmp_path):
    """A bundle exported with ``device_streaming=...`` serves device-resident
    streams with no model code, matching the live pool's transcript exactly; the
    pool adopts the bundle's baked dimensions over mismatched constructor args."""
    from speechless_tpu.serving_export import (ExportedTranscriber,
                                               export_transcriber)

    export_transcriber(transcriber, tmp_path / "bundle",
                       sample_buckets=(16384,),
                       device_streaming={"window_s": 1.024, "chunk_cap_s": 0.5,
                                         "max_sessions": 4, "max_batch": 4})
    bundle = ExportedTranscriber(tmp_path / "bundle")
    assert bundle.device_feed_spec["window"] == pool.window
    assert bundle.device_feed_spec["chunk_cap"] == pool.chunk_cap

    audio = _audio(52000, seed=9)
    expected = pool.create_stream().transcribe_stream(audio, 4000)

    # Deliberately mismatched args: the bundle's baked dims must win.
    bundle_pool = DeviceStreamingPool(bundle, window_s=8.0, margin_s=0.25,
                                      max_batch=16, max_wait_ms=20.0,
                                      max_sessions=64)
    assert bundle_pool.window == pool.window
    assert bundle_pool.max_sessions == 4
    assert bundle_pool.batcher.max_batch == 4
    bundle_pool.start()
    try:
        assert bundle_pool.create_stream().transcribe_stream(audio, 4000) == expected
    finally:
        bundle_pool.stop()


def test_posteriors_bundle_serves_greedy_pool(transcriber, pool, tmp_path):
    """A bundle whose feed program bakes the posterior output (post_starts input +
    6 outputs) must still serve a pool constructed with ``beam_partials=False``: the
    dispatch arity follows the program's baked signature, not the pool flag.
    Regression — the flag used to drive the arity, so every greedy feed on a
    posteriors bundle failed and poisoned the pool."""
    from speechless_tpu.serving_export import (ExportedTranscriber,
                                               export_transcriber)

    export_transcriber(transcriber, tmp_path / "bundle",
                       sample_buckets=(16384,),
                       device_streaming={"window_s": 1.024, "chunk_cap_s": 0.5,
                                         "max_sessions": 4, "max_batch": 4,
                                         "posteriors": True, "post_rows": 12})
    bundle = ExportedTranscriber(tmp_path / "bundle")
    assert bundle.device_feed_spec["posteriors"]

    audio = _audio(52000, seed=9)
    expected = pool.create_stream().transcribe_stream(audio, 4000)

    greedy_pool = DeviceStreamingPool(bundle, margin_s=0.25, beam_partials=False)
    assert greedy_pool.beam_partials is False
    greedy_pool.start()
    try:
        assert greedy_pool.create_stream().transcribe_stream(audio, 4000) == expected
        with pytest.raises(ValueError, match="beam_partials=False"):
            greedy_pool.create_stream(partial_decode="beam")
    finally:
        greedy_pool.stop()


def test_bundle_without_feed_program_rejected(transcriber, tmp_path):
    """Bundles exported without device_streaming keep rejecting the device pool
    with an actionable message."""
    from speechless_tpu.serving_export import (ExportedTranscriber,
                                               export_transcriber)

    export_transcriber(transcriber, tmp_path / "plain", sample_buckets=(16384,))
    with pytest.raises(ValueError, match="device_streaming"):
        DeviceStreamingPool(ExportedTranscriber(tmp_path / "plain"))


def test_device_session_final_decode(transcriber, pool):
    """Two-pass device sessions: live greedy text unchanged, finish returns the
    offline decode of the complete accumulated audio."""
    audio = _audio(52000, seed=12)
    sid = pool.create(final_decode=True)
    for start in range(0, len(audio), 4000):
        pool.feed(sid, audio[start:start + 4000])
    final, live = pool.finish_with_live_text(sid)
    assert final == transcriber.transcribe_long_audio(audio)
    plain = pool.create_stream()
    assert live == plain.transcribe_stream(audio, 4000)
    with pytest.raises(ValueError, match="final_decode"):
        pool.create_stream().finalize()


def test_direct_sessions_are_reap_safe(transcriber):
    """Sessions driven through the documented create_stream()/session.feed() surface
    refresh the pool's idle stamp and lock, so the reaper never frees the row of an
    actively-fed stream (regression: direct feeds used to bypass both)."""
    import time as time_module

    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=2, max_wait_ms=5.0, chunk_cap_s=0.5,
                               max_sessions=2, idle_timeout_s=0.4)
    pool.start()
    try:
        session = pool.create_stream()
        row = session._row
        for _ in range(4):  # keep feeding past the idle timeout
            time_module.sleep(0.15)
            session.feed(_audio(2000, seed=30))
        other = pool.create()  # runs the reaper
        assert not session._finished  # actively-fed session survived
        assert row not in pool._free
        pool.close(other)
        # And a genuinely idle direct session IS reaped, freeing its row.
        time_module.sleep(0.6)
        pool.create()  # reaper runs; the idle session's row must be reclaimable
        assert session._finished
    finally:
        pool.stop()


def test_failed_dispatch_poisons_sessions_and_pool_recovers(transcriber):
    """One failing device dispatch must not brick the pool: the failed batch's
    waiters get the error, old sessions raise a clear 'stream lost', and new
    sessions serve correctly on rebuilt device state."""
    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=2, max_wait_ms=5.0, chunk_cap_s=0.5,
                               max_sessions=2)
    pool.start()
    try:
        audio = _audio(20000, seed=31)
        expected = pool.create_stream().transcribe_stream(audio, 4000)

        session = pool.create_stream()
        real_feed = pool._feed

        def exploding_feed(*args, **kwargs):
            raise RuntimeError("tunnel RPC lost")

        pool._feed = exploding_feed
        with pytest.raises(RuntimeError, match="tunnel RPC lost"):
            session.feed(_audio(2000, seed=32))
        pool._feed = real_feed

        with pytest.raises(RuntimeError, match="stream lost"):
            session.feed(_audio(2000, seed=32))
        with pytest.raises(RuntimeError, match="stream lost"):
            session.finish()

        fresh = pool.create_stream()
        assert fresh.transcribe_stream(audio, 4000) == expected
    finally:
        pool.stop()


def test_device_word_timestamps_match_host(transcriber, pool):
    """Short streams (< one window, where device/host transcripts are pinned
    identical) produce byte- and time-identical word timestamps; long streams keep
    the words==transcript invariant (transcripts may differ from the host path by
    the documented trailing-window z-norm)."""
    short = _audio(12000, seed=40)
    host = StreamingTranscriber(transcriber, window_s=1.024, margin_s=0.25)
    host_words = []
    for start in range(0, len(short), 4000):
        host.feed(short[start:start + 4000])
        host_words.extend(host.pop_new_words())
    host.finish()
    host_words.extend(host.pop_new_words())

    sid = pool.create()
    device_words = []
    for start in range(0, len(short), 4000):
        device_words.extend(pool.feed_with_state(sid, short[start:start + 4000])
                            ["words"])
    state = pool.finish_with_state(sid)
    device_words.extend(state["words"])
    assert device_words == host_words
    assert [w["word"] for w in device_words] == [w for w in
                                                 state["text"].split(" ") if w]

    long_audio = _audio(52000, seed=41)
    sid = pool.create()
    words = []
    for start in range(0, len(long_audio), 4000):
        words.extend(pool.feed_with_state(sid, long_audio[start:start + 4000])
                     ["words"])
    state = pool.finish_with_state(sid)
    words.extend(state["words"])
    assert [w["word"] for w in words] == [w for w in state["text"].split(" ") if w]
    last_end = 0.0
    for w in words:
        assert 0.0 <= w["start_s"] < w["end_s"] <= len(long_audio) / 16000.0
        assert w["start_s"] >= last_end - 1e-9
        last_end = w["end_s"]


def test_device_pool_refuses_beam_partials_when_disabled(transcriber):
    """A pool built without the posterior output must refuse beam sessions loudly at
    create (and leak no session row)."""
    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=4, chunk_cap_s=0.5, max_sessions=4,
                               beam_partials=False)
    pool.start()
    try:
        with pytest.raises(ValueError, match="posterior"):
            pool.create(partial_decode="beam")
        assert pool.session_count == 0  # no session row leaked by the refusal
    finally:
        pool.stop()


def test_device_pool_beam_partials_match_host_beam_stream(transcriber, pool):
    """A sub-window beam-partial session decodes EXACTLY like the host-window beam
    path fed the same chunks (identical buffers -> identical per-window z-norm ->
    identical posteriors; the fused program's posteriors drive the same incremental
    prefix beam). Offline equality is NOT expected here: frames finalize from
    intermediate windows whose z-norm differs from the full utterance — the same
    property the host path has."""
    audio = _audio(12000, seed=6)  # < one window
    host = StreamingTranscriber(transcriber, window_s=1.024, margin_s=0.25,
                                partial_decode="beam")
    for start in range(0, len(audio), 4000):
        host.feed(audio[start:start + 4000])
    host.finish()
    expected = host.text

    session = pool.create_stream(partial_decode="beam")
    partial = None
    for start in range(0, len(audio), 4000):
        partial = session.feed(audio[start:start + 4000])
    assert session.final_up_to_s == 0.0  # replace semantics while live
    final = session.finish()
    assert final == session.text
    assert session.final_up_to_s == pytest.approx(len(audio) / 16000.0)
    assert isinstance(partial, str)
    assert final == expected
    # The greedy machinery kept running (words/timestamps + greedy_text).
    assert session.greedy_text == host.greedy_text


def test_device_pool_beam_matches_host_pool_beam_long_stream(transcriber, pool):
    """Beam sessions carry exact beam state across window shifts: a long stream
    through the device pool equals the host-window beam path fed the SAME per-window
    posteriors semantics on sub-window streams, and on longer streams both stay
    self-consistent (device z-norm sees the trailing window, so cross-path equality
    is only guaranteed sub-window; here we pin determinism and coexistence)."""
    audio = _audio(40000, seed=7)
    texts = []
    for _ in range(2):  # same stream twice -> identical transcript (determinism)
        session = pool.create_stream(partial_decode="beam")
        for start in range(0, len(audio), 5000):
            session.feed(audio[start:start + 5000])
        session.finish()
        texts.append(session.text)
    assert texts[0] == texts[1]

    # A greedy session interleaved with a beam session decodes exactly as without it.
    greedy_alone = pool.create_stream()
    alone = greedy_alone.transcribe_stream(audio, chunk_samples=4000)
    beam = pool.create_stream(partial_decode="beam")
    greedy = pool.create_stream()
    out = ""
    for start in range(0, len(audio), 4000):
        beam.feed(audio[start:start + 4000])
        out += greedy.feed(audio[start:start + 4000])
    out += greedy.finish()
    beam.finish()
    assert out == alone


def test_pipelined_beam_sessions_match_sync_beam(transcriber, pool):
    """partial_decode='beam_pipelined' on the device pool: advances overlap the
    next feed via BeamAdvanceBatcher.submit_nowait, and the finished transcript is
    byte-identical to synchronous 'beam' sessions on the same audio. Also pins
    `transcribe_stream`'s RETURN value in beam modes: finish() returns the FULL
    re-ranked best (replace semantics), so the convenience wrapper must not
    concatenate it after the pre-flush text (which would double the transcript)."""
    audios = [_audio(int(n), seed=60 + i) for i, n in enumerate((30000, 45000))]

    def transcribe(audio, mode):
        session = pool.create_stream(partial_decode=mode)
        returned = session.transcribe_stream(audio, 4000)
        assert returned == session.text  # no duplication in the wrapper's return
        return returned

    for audio in audios:
        assert (transcribe(audio, "beam_pipelined")
                == transcribe(audio, "beam"))


def test_warm_up_beam_compiles_every_advance_batch_size(transcriber, pool):
    """`warm_up_beam` pre-compiles the single-stream advance AND every bucketed
    vmapped size, so no live feed ever hits a cold advance compile; beam sessions
    work unchanged afterwards."""
    pool.warm_up_beam()
    audio = _audio(24000, seed=70)
    session = pool.create_stream(partial_decode="beam")
    assert session.transcribe_stream(audio, 4000) == session.text


def test_sliced_posteriors_match_full_window(transcriber):
    """Round-5 perf lever: the feed program fetches only a static ``post_rows``
    posterior slice per beam feed (offset computed host-side BEFORE dispatch via the
    deterministic mirror arithmetic) instead of the full window block. Transcripts
    must be byte-identical to a full-window-posterior pool (post_rows=None) on the
    same audio at matched feed cadence (streamed transcripts depend on dispatch
    boundaries through the per-window z-norm, so the comparison feeds chunks at the
    sliced pool's beam piece cap) — including multi-window streams whose finish()
    drains the withheld margin through the slice-sized flush loop (zero-length
    dispatches never change the window content, so the drain loop is cadence
    -neutral)."""
    audio = _audio(40000, seed=90)
    texts = {}
    chunk = None
    for post_rows in (16, None):
        pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                                   max_batch=4, chunk_cap_s=0.5, max_sessions=4,
                                   post_rows=post_rows)
        if post_rows is not None:
            assert pool.post_rows == post_rows < pool.window_frames
            assert pool.beam_piece_cap == (post_rows - 8) * pool.spf
            chunk = pool.beam_piece_cap
        else:
            assert pool.post_rows is None
        pool.start()
        try:
            for mode in ("beam", "beam_pipelined"):
                session = pool.create_stream(partial_decode=mode)
                text = session.transcribe_stream(audio, chunk)
                texts.setdefault(mode, []).append((text, session.greedy_text))
        finally:
            pool.stop()
    for mode, runs in texts.items():
        assert runs[0] == runs[1], "sliced != full-window for {}".format(mode)
        assert runs[0][0], "empty transcript makes the parity check vacuous"


def test_failed_pipelined_advance_releases_row(transcriber):
    """A failed pipelined beam advance poisons the session AND releases its pooled
    HBM row immediately — repeated advance failures must not exhaust max_sessions
    until the idle reaper runs (advisor round-4 finding)."""
    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=2, max_wait_ms=5.0, chunk_cap_s=0.5,
                               max_sessions=2)
    pool.start()
    try:
        session = pool.create_stream(partial_decode="beam_pipelined")
        row = session._row
        batcher = pool._get_beam_batcher()

        def exploding_advance(*args, **kwargs):
            raise RuntimeError("advance lost")

        batcher.decoder.feed = exploding_advance
        batcher.decoder.feed_batch = exploding_advance
        with pytest.raises(RuntimeError, match="advance lost|beam stream lost"):
            for i in range(8):  # submit, then collect on a later feed
                session.feed(_audio(4000, seed=91 + i))
            session.finish()
        assert session._poisoned
        assert row in pool._free
        # The pool still serves its FULL session budget right away.
        a, b = pool.create(), pool.create()
        pool.close(a), pool.close(b)
    finally:
        pool.stop()


def test_beam_session_created_before_start_adopts_batcher(transcriber):
    """A beam session created BEFORE pool.start() must adopt the coalescing
    batcher once the pool starts (the advance path is resolved per call, not
    captured at construction — advisor round-4 finding)."""
    pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                               max_batch=4, chunk_cap_s=0.5, max_sessions=4)
    session = pool.create_stream(partial_decode="beam_pipelined")
    pool.start()
    try:
        batcher = pool._get_beam_batcher()
        assert batcher.started
        before = batcher.items
        text = session.transcribe_stream(_audio(30000, seed=95), 4000)
        assert batcher.items > before  # advances rode the batcher
        # And the transcript matches a post-start session's.
        check = pool.create_stream(partial_decode="beam_pipelined")
        assert check.transcribe_stream(_audio(30000, seed=95), 4000) == text
    finally:
        pool.stop()


def test_device_pipelined_backlog_coalesces_advances(transcriber):
    """Device-pool mirror of the host coalescing contract: a session whose advance
    wall lags the feed cadence queues rows instead of stalling, catches up in one
    coalesced advance, and finishes with the exact synchronous-beam transcript."""
    audio = _audio(40000, seed=97)
    finals = {}
    for mode in ("beam", "beam_pipelined"):
        pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                                   max_batch=4, chunk_cap_s=0.5, max_sessions=4)
        pool.start()
        try:
            session = pool.create_stream(partial_decode=mode)
            if mode == "beam_pipelined":
                decoder = session._beam_decoder
                submitted = []

                def slow_advance(state, rows, _decoder=decoder,
                                 _submitted=submitted):
                    _submitted.append(np.asarray(rows))

                    class Handle:
                        ready = False  # models an advance slower than the feeds

                        def wait(self):
                            return _decoder.feed(state, rows)

                    return Handle()

                session._beam_submit = slow_advance
            finals[mode] = session.transcribe_stream(audio, 4000)
        finally:
            pool.stop()
    assert finals["beam_pipelined"] == finals["beam"]
    assert finals["beam"]  # non-degenerate
    assert len(submitted) <= 3  # queued rows drained in coalesced advances
    assert submitted[-1].shape[0] > max(r.shape[0] for r in submitted[:-1])


class TestResidentBeam:
    """beam_mode='resident': the incremental beam's carry lives in the pool's HBM
    state and advances INSIDE the fused feed program — zero extra dispatches per
    feed (the separate-advance path pays ~2 tunnel round-trips per wave), partials
    never lag, and every transcript must be byte-identical to the posterior-mode
    sync beam."""

    def _pool(self, transcriber, beam_mode="posterior", **kwargs):
        kwargs.setdefault("max_sessions", 4)
        pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                                   max_batch=4, chunk_cap_s=0.5,
                                   beam_mode=beam_mode, beam_engine="xla"
                                   if beam_mode == "resident" else "auto",
                                   **kwargs)
        pool.start()
        return pool

    def test_matches_posterior_sync_beam(self, transcriber):
        """Final transcripts byte-identical to the posterior sync beam across
        multiple chunk sizes, including a last-partial comparison and the word
        timestamps (driven by the same greedy emissions in both modes)."""
        audio = _audio(52000, seed=21)
        for chunk in (4000, 7000):
            ref_pool = self._pool(transcriber)
            try:
                ref = ref_pool.create_stream(partial_decode="beam")
                for start in range(0, len(audio), chunk):
                    ref.feed(audio[start:start + chunk])
                ref_state = ref.finish_with_state()
            finally:
                ref_pool.stop()

            res_pool = self._pool(transcriber, beam_mode="resident")
            try:
                assert res_pool.beam_mode == "resident"
                assert res_pool.post_rows is None
                session = res_pool.create_stream(partial_decode="beam")
                for start in range(0, len(audio), chunk):
                    session.feed(audio[start:start + chunk])
                state = session.finish_with_state()
            finally:
                res_pool.stop()
            assert state["text"] == ref_state["text"]
            assert state["words"] == ref_state["words"]

    def test_greedy_sessions_unaffected(self, transcriber, pool):
        """Greedy sessions on a resident pool transcribe exactly like on a normal
        pool (the in-program advance is skipped for greedy-only dispatches), and
        coexist with beam sessions in the same batches."""
        audio = _audio(40000, seed=22)
        expected = pool.create_stream().transcribe_stream(audio, 4000)

        res_pool = self._pool(transcriber, beam_mode="resident")
        try:
            assert res_pool.create_stream().transcribe_stream(audio, 4000) \
                == expected
            greedy = res_pool.create_stream()
            beam = res_pool.create_stream(partial_decode="beam")
            out = ""
            for start in range(0, len(audio), 4000):
                beam.feed(audio[start:start + 4000])
                out += greedy.feed(audio[start:start + 4000])
            out += greedy.finish()
            beam.finish()
            assert out == expected
            assert beam.text  # non-degenerate
        finally:
            res_pool.stop()

    def test_rollover_commits_and_matches(self, transcriber):
        """A live prefix outgrowing max_decoded_length rolls the committed tokens
        to the host and restarts the device row from fresh state (the reset rides
        the NEXT dispatch) — byte-identical to the posterior path's per-piece
        rollover, and the committed prefix is actually exercised."""
        audio = _audio(60000, seed=23)
        # chunk_frames must match across modes: the rollover guard fires when a
        # prefix could saturate within the NEXT advance block (max_live + cf >
        # max_decoded_length), so the block size is part of its semantics.
        opts = {"max_decoded_length": 48, "chunk_frames": 40}
        ref_pool = self._pool(transcriber, beam_opts=opts)
        try:
            ref = ref_pool.create_stream(partial_decode="beam")
            expected = ref.transcribe_stream(audio, 4000)
        finally:
            ref_pool.stop()

        res_pool = self._pool(transcriber, beam_mode="resident", beam_opts=opts)
        try:
            session = res_pool.create_stream(partial_decode="beam")
            got = session.transcribe_stream(audio, 4000)
            assert session._committed.size > 0  # rollover actually fired
        finally:
            res_pool.stop()
        assert got == expected

    def test_session_row_reuse_resets_beam_state(self, transcriber):
        """A session on a reused HBM row starts from fresh beam state: its
        transcript equals a first-use session's on the same audio."""
        audio = _audio(30000, seed=24)
        res_pool = self._pool(transcriber, beam_mode="resident", max_sessions=1)
        try:
            first = res_pool.create_stream(partial_decode="beam")
            a = first.transcribe_stream(audio, 4000)
            second = res_pool.create_stream(partial_decode="beam")
            assert second._row == first._row  # the single row was reused
            assert second.transcribe_stream(audio, 4000) == a
        finally:
            res_pool.stop()

    def test_partials_do_not_lag(self, transcriber):
        """Resident partials reflect every finalized row of THIS feed (no
        one-feed pipeline lag): feeding the same prefix to a fresh posterior sync
        session yields the same partial after each aligned feed."""
        audio = _audio(24000, seed=25)
        res_pool = self._pool(transcriber, beam_mode="resident")
        post_pool = self._pool(transcriber)
        try:
            res = res_pool.create_stream(partial_decode="beam")
            ref = post_pool.create_stream(partial_decode="beam")
            for start in range(0, len(audio), 4000):
                p_res = res.feed(audio[start:start + 4000])
                p_ref = ref.feed(audio[start:start + 4000])
                assert p_res == p_ref
        finally:
            res_pool.stop()
            post_pool.stop()

    def test_mode_validation(self, transcriber, pool, tmp_path):
        """resident rejects: beam_pipelined sessions, beam_partials=False,
        unknown modes, and AOT bundles (the advance is jitted into the live feed
        program)."""
        from speechless_tpu.serving_export import (ExportedTranscriber,
                                                   export_transcriber)

        with pytest.raises(ValueError, match="beam_mode"):
            DeviceStreamingPool(transcriber, beam_mode="fused")
        with pytest.raises(ValueError, match="beam_partials=False"):
            DeviceStreamingPool(transcriber, beam_mode="resident",
                                beam_partials=False)
        res_pool = self._pool(transcriber, beam_mode="resident")
        try:
            with pytest.raises(ValueError, match="pipeline"):
                res_pool.create(partial_decode="beam_pipelined")
        finally:
            res_pool.stop()

        export_transcriber(transcriber, tmp_path / "bundle",
                           sample_buckets=(16384,),
                           device_streaming={"window_s": 1.024,
                                             "chunk_cap_s": 0.5,
                                             "max_sessions": 4, "max_batch": 4})
        bundle = ExportedTranscriber(tmp_path / "bundle")
        with pytest.raises(ValueError, match="live serving.Transcriber"):
            DeviceStreamingPool(bundle, beam_mode="resident")

    def test_warm_up_beam_is_the_feed_warm_up(self, transcriber):
        """warm_up_beam on a resident pool compiles the (single) fused program and
        beam sessions serve right after."""
        res_pool = self._pool(transcriber, beam_mode="resident")
        try:
            res_pool.warm_up_beam()
            audio = _audio(20000, seed=26)
            session = res_pool.create_stream(partial_decode="beam")
            assert session.transcribe_stream(audio, 4000) == session.text
        finally:
            res_pool.stop()

    def test_pallas_engine_parity(self, transcriber):
        """beam_engine='pallas' embeds the sublane-batched kernel (its OWN carry
        layout — the XLA advance would misread it) inside the fused feed program;
        transcripts match the XLA resident engine byte-for-byte. Interpret mode on
        CPU: short audio keeps this test bounded."""
        audio = _audio(24000, seed=27)
        out = {}
        for engine in ("xla", "pallas"):
            pool = DeviceStreamingPool(transcriber, window_s=1.024, margin_s=0.25,
                                       max_batch=4, chunk_cap_s=0.5,
                                       max_sessions=4, beam_mode="resident",
                                       beam_engine=engine)
            pool.start()
            try:
                out[engine] = pool.create_stream(
                    partial_decode="beam").transcribe_stream(audio, 4000)
            finally:
                pool.stop()
        assert out["pallas"] == out["xla"]
        assert out["xla"]  # non-degenerate
