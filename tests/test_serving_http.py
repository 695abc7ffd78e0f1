"""HTTP transcription service (`serving_http`): endpoint contracts, body decoding,
dynamic micro-batching, and parity with the direct `Transcriber` calls."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_http import (RequestError, TranscriptionServer,
                                         _parse_audio)

ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")


@pytest.fixture(scope="module")
def transcriber():
    import jax
    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    return Transcriber(config, params, ALPHABET, sample_buckets=(16384,))


@pytest.fixture(scope="module")
def server(transcriber):
    srv = TranscriptionServer(transcriber, port=0, max_batch=4, max_wait_ms=30.0,
                              stream_window_s=1.0, stream_margin_s=0.25)
    srv.start()
    yield srv
    srv.stop()


def _request(server, path, data=None, content_type="application/json", method=None):
    req = urllib.request.Request(
        "http://127.0.0.1:{}{}".format(server.port, path), data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", content_type)
    try:
        with urllib.request.urlopen(req, timeout=300) as response:
            return response.status, json.loads(response.read())
    except urllib.error.HTTPError as error:
        return error.code, json.loads(error.read())


def _pcm_body(audio, sample_rate=16000):
    return json.dumps({"pcm": [float(x) for x in audio],
                       "sample_rate": sample_rate}).encode()


def test_healthz(server):
    status, payload = _request(server, "/healthz")
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["sample_buckets"] == [16384]


def test_transcribe_json_matches_direct_call(server, transcriber):
    audio = (np.random.RandomState(0).randn(9000) * 0.1).astype(np.float32)
    status, payload = _request(server, "/v1/transcribe", _pcm_body(audio))
    assert status == 200
    text, confidence = transcriber.transcribe_audio_with_confidence(audio)
    assert payload["text"] == text
    assert payload["confidence"] == pytest.approx(confidence, abs=1e-5)


def test_transcribe_wav_body(server, transcriber):
    import scipy.io.wavfile as wavfile
    # An 8 kHz int16 wav: exercises bytes decode + polyphase resample to 16 kHz.
    audio = (np.random.RandomState(1).randn(4000) * 0.1).astype(np.float32)
    buffer = io.BytesIO()
    wavfile.write(buffer, 8000, (audio * 32767).astype(np.int16))
    status, payload = _request(server, "/v1/transcribe", buffer.getvalue(),
                               content_type="audio/wav")
    assert status == 200
    assert isinstance(payload["text"], str)
    assert 0 < payload["confidence"] <= 1


def test_timestamps(server, transcriber):
    audio = (np.random.RandomState(2).randn(9000) * 0.1).astype(np.float32)
    status, payload = _request(server, "/v1/transcribe?timestamps=1",
                               _pcm_body(audio))
    assert status == 200
    expected = transcriber.transcribe_audio_with_timestamps(audio)
    assert [w["word"] for w in payload["words"]] == [w for w, _, _ in expected]
    for got, (_, start, end) in zip(payload["words"], expected):
        assert got["start_s"] == pytest.approx(start, abs=1e-3)
        assert got["end_s"] == pytest.approx(end, abs=1e-3)


def test_concurrent_requests_are_batched(server, transcriber):
    before = _request(server, "/v1/metrics")[1]
    rng = np.random.RandomState(3)
    audios = [(rng.randn(6000) * 0.1).astype(np.float32) for _ in range(4)]
    results = [None] * 4

    def post(i):
        results[i] = _request(server, "/v1/transcribe", _pcm_body(audios[i]))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for audio, (status, payload) in zip(audios, results):
        assert status == 200
        assert payload["text"] == transcriber.transcribe_audio(audio)
    after = _request(server, "/v1/metrics")[1]
    assert after["requests"] - before.get("requests", 0) == 4
    # 4 concurrent posts against a 30 ms window must coalesce below 1 batch each.
    assert after["batches"] - before.get("batches", 0) < 4


def test_streaming_session_over_http(server, transcriber):
    """POST /v1/stream lifecycle: create -> feed chunks -> finish equals the direct
    single-stream decode; finished/unknown sessions 404."""
    from speechless_tpu.serving_streaming import StreamingTranscriber

    audio = (np.random.RandomState(9).randn(40000) * 0.3).astype(np.float32)
    expected = StreamingTranscriber(transcriber, window_s=1.0, margin_s=0.25
                                    ).transcribe_stream(audio, chunk_samples=8000)

    status, payload = _request(server, "/v1/stream", b"{}")
    assert status == 200
    sid = payload["session"]
    assert _request(server, "/healthz")[1]["streaming_sessions"] == 1
    for start in range(0, len(audio), 8000):
        status, chunk_reply = _request(server, "/v1/stream/{}".format(sid),
                                       _pcm_body(audio[start:start + 8000]))
        assert status == 200 and "partial" in chunk_reply
    status, final = _request(server, "/v1/stream/{}/finish".format(sid), b"{}")
    assert status == 200
    assert final["text"] == expected
    # Finished and unknown sessions are gone.
    assert _request(server, "/v1/stream/{}".format(sid),
                    _pcm_body(audio[:8000]))[0] == 404
    assert _request(server, "/v1/stream/nosuch/finish", b"{}")[0] == 404
    metrics = _request(server, "/v1/metrics")[1]
    assert metrics["streaming"]["windows"] >= 1


def test_device_streams_over_http(transcriber):
    """`device_streams=True` serves the same /v1/stream routes from HBM-resident
    windows; a short stream's transcript matches the host-window pool exactly."""
    from speechless_tpu.serving_device_stream import DeviceStreamingPool
    from speechless_tpu.serving_streaming import StreamingTranscriber

    srv = TranscriptionServer(transcriber, port=0, max_batch=4, max_wait_ms=30.0,
                              stream_window_s=1.024, stream_margin_s=0.25,
                              device_streams=True)
    assert isinstance(srv.streams, DeviceStreamingPool)
    srv.start()
    try:
        audio = (np.random.RandomState(11).randn(12000) * 0.3).astype(np.float32)
        expected = StreamingTranscriber(transcriber, window_s=1.024, margin_s=0.25
                                        ).transcribe_stream(audio, chunk_samples=4000)
        status, payload = _request(srv, "/v1/stream", b"{}")
        assert status == 200
        sid = payload["session"]
        for start in range(0, len(audio), 4000):
            status, reply = _request(srv, "/v1/stream/{}".format(sid),
                                     _pcm_body(audio[start:start + 4000]))
            assert status == 200 and "partial" in reply
        status, final = _request(srv, "/v1/stream/{}/finish".format(sid), b"{}")
        assert status == 200 and final["text"] == expected
        assert _request(srv, "/v1/metrics")[1]["streaming"]["feeds"] >= 3
        # Beam-partial sessions work on the device pool too (its feed program
        # emits posteriors): parity with the host-window beam path on the same
        # sub-window stream.
        host_beam = StreamingTranscriber(transcriber, window_s=1.024,
                                         margin_s=0.25, partial_decode="beam")
        host_beam.transcribe_stream(audio, chunk_samples=4000)
        status, payload = _request(srv, "/v1/stream",
                                   json.dumps({"partial_decode": "beam"}).encode())
        assert status == 200
        sid = payload["session"]
        for start in range(0, len(audio), 4000):
            status, reply = _request(srv, "/v1/stream/{}".format(sid),
                                     _pcm_body(audio[start:start + 4000]))
            assert status == 200
            assert reply["partial"] == reply["text"]  # replace semantics
        status, final = _request(srv, "/v1/stream/{}/finish".format(sid), b"{}")
        assert status == 200 and final["text"] == host_beam.text
        # Pipelined beam over the wire: partials lag one feed, but finish() is
        # byte-identical to the synchronous beam session above.
        status, payload = _request(
            srv, "/v1/stream",
            json.dumps({"partial_decode": "beam_pipelined"}).encode())
        assert status == 200
        sid = payload["session"]
        for start in range(0, len(audio), 4000):
            status, reply = _request(srv, "/v1/stream/{}".format(sid),
                                     _pcm_body(audio[start:start + 4000]))
            assert status == 200
        status, final = _request(srv, "/v1/stream/{}/finish".format(sid), b"{}")
        assert status == 200 and final["text"] == host_beam.text
        assert _request(srv, "/v1/stream",
                        json.dumps({"partial_decode": "beam_sideways"}).encode()
                        )[0] == 400  # unknown modes still rejected
    finally:
        srv.stop()


def test_error_statuses(server):
    assert _request(server, "/nope")[0] == 404
    assert _request(server, "/v1/transcribe", b"{not json")[0] == 400
    assert _request(server, "/v1/transcribe", b'{"volume": 11}')[0] == 400
    assert _request(server, "/v1/transcribe", b'{"pcm": []}')[0] == 400
    assert _request(server, "/v1/transcribe", b"RIFFbogus",
                    content_type="audio/ogg")[0] == 415
    assert _request(server, "/v1/transcribe", b"notawav",
                    content_type="audio/wav")[0] == 400


def test_keepalive_survives_bodied_stream_create(server):
    """HTTP/1.1 persistent connections: a body sent with the (bodiless) create and
    finish routes must be drained — unread bytes would be parsed as the next request
    line on the same connection, 400-ing every keep-alive client's second request."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
    try:
        conn.request("POST", "/v1/stream", body=b"{}",
                     headers={"Content-Type": "application/json"})
        response = conn.getresponse()
        assert response.status == 200
        sid = json.loads(response.read())["session"]
        # Second request on the SAME connection must not see leftover body bytes.
        conn.request("GET", "/healthz")
        response = conn.getresponse()
        assert response.status == 200
        assert json.loads(response.read())["status"] == "ok"
        conn.request("POST", "/v1/stream/{}/finish".format(sid), body=b"{}",
                     headers={"Content-Type": "application/json"})
        response = conn.getresponse()
        assert response.status == 200
        response.read()
        conn.request("GET", "/healthz")
        response = conn.getresponse()
        assert response.status == 200
        response.read()
    finally:
        conn.close()


def test_server_rejects_bad_stream_window_at_construction(transcriber):
    """Misconfigured streaming windows fail at server construction, not as a
    misleading 501 on every create request."""
    with pytest.raises(ValueError, match="window_s"):
        TranscriptionServer(transcriber, port=0, stream_window_s=1.0,
                            stream_margin_s=0.5)


def test_parse_audio_resamples_json_pcm():
    audio = np.sin(np.linspace(0, 40 * np.pi, 8000)).astype(np.float32)
    parsed = _parse_audio("application/json",
                          _pcm_body(audio, sample_rate=8000))
    assert len(parsed) == 16000  # 8 kHz -> 16 kHz doubles the sample count
    with pytest.raises(RequestError):
        _parse_audio("application/json", b'{"pcm": [[1.0]]}')


def test_streaming_final_decode_over_http(server, transcriber):
    """POST /v1/stream {"final_decode": true}: /finish returns the offline-path
    transcript as "text" and the live greedy pass as "live_text"."""
    audio = (np.random.RandomState(13).randn(30000) * 0.3).astype(np.float32)
    status, payload = _request(server, "/v1/stream",
                               json.dumps({"final_decode": True}).encode())
    assert status == 200
    sid = payload["session"]
    for start in range(0, len(audio), 4000):
        status, _ = _request(server, "/v1/stream/{}".format(sid),
                             _pcm_body(audio[start:start + 4000]))
        assert status == 200
    status, final = _request(server, "/v1/stream/{}/finish".format(sid), b"{}")
    assert status == 200
    assert final["text"] == transcriber.transcribe_long_audio(audio)
    assert "live_text" in final and final["live_text"]
    # Malformed create body is a 400, not a silent single-pass session.
    assert _request(server, "/v1/stream", b"{nope")[0] == 400


def test_stream_create_accepts_bodiless_post(server):
    """POST /v1/stream with an empty body (Content-Length 0 — the pre-final_decode
    client behavior) must keep working, not 411."""
    status, payload = _request(server, "/v1/stream", data=b"", method="POST")
    assert status == 200 and "session" in payload
    status, _ = _request(server, "/v1/stream/{}/finish".format(payload["session"]),
                         b"{}")
    assert status == 200


def test_nbest_over_http(server, transcriber):
    audio = np.random.RandomState(2).randn(4000).astype(np.float32) * 0.1
    status, payload = _request(server, "/v1/transcribe?nbest=3", data=_pcm_body(audio))
    assert status == 200
    assert payload["hypotheses"]
    assert payload["text"] == payload["hypotheses"][0]["text"]
    direct = transcriber.transcribe_nbest(audio, 3)
    assert [h["text"] for h in payload["hypotheses"]] == [t for t, _ in direct]
    scores = [h["score"] for h in payload["hypotheses"]]
    assert scores == sorted(scores, reverse=True)


def test_nbest_error_statuses(server):
    audio = np.zeros(2000, dtype=np.float32)
    status, payload = _request(server, "/v1/transcribe?nbest=3&timestamps=1",
                               data=_pcm_body(audio))
    assert status == 400 and "mutually exclusive" in payload["error"]
    status, _ = _request(server, "/v1/transcribe?nbest=zz", data=_pcm_body(audio))
    assert status == 400
    status, _ = _request(server, "/v1/transcribe?nbest=0", data=_pcm_body(audio))
    assert status == 400
    status, payload = _request(server, "/v1/transcribe?nbest=9999",
                               data=_pcm_body(audio))
    # Capped BEFORE anything compiles — an uncapped n would let any client force a
    # cold device compile per (n, bucket).
    assert status == 400 and "beam width" in payload["error"]


def test_nbest_rides_the_batcher_thread(server, transcriber):
    """N-best dispatch obeys the module's threading contract (all device programs run
    on the single batcher thread) and is therefore visible in the batch metrics."""
    audio = np.random.RandomState(3).randn(4000).astype(np.float32) * 0.1
    before = server.batcher.metrics()["requests"]
    status, _ = _request(server, "/v1/transcribe?nbest=2", data=_pcm_body(audio))
    assert status == 200
    assert server.batcher.metrics()["requests"] == before + 1


def test_streaming_beam_partials_over_http(server, transcriber):
    """POST /v1/stream {"partial_decode": "beam"}: live partials come from the
    incremental prefix beam — each feed's "partial" is the FULL current best text
    (replace semantics) and equals "text" from the same reply; an invalid mode is a
    400."""
    audio = (np.random.RandomState(21).randn(30000) * 0.3).astype(np.float32)
    status, payload = _request(server, "/v1/stream",
                               json.dumps({"partial_decode": "beam"}).encode())
    assert status == 200
    sid = payload["session"]
    last = None
    for start in range(0, len(audio), 4000):
        status, reply = _request(server, "/v1/stream/{}".format(sid),
                                 _pcm_body(audio[start:start + 4000]))
        assert status == 200
        assert reply["partial"] == reply["text"]  # full replacement text
        last = reply
    status, final = _request(server, "/v1/stream/{}/finish".format(sid), b"{}")
    assert status == 200 and isinstance(final["text"], str)
    assert last is not None
    assert _request(server, "/v1/stream",
                    json.dumps({"partial_decode": "viterbi"}).encode())[0] == 400


def test_transcribe_octet_stream_fast_path(server, transcriber):
    """`application/octet-stream` = raw little-endian float32 PCM: the zero-parse
    fast path (round-4 verdict's pre-batcher tail lever). Must transcribe
    identically to the JSON-PCM route, honor the `; rate=` parameter, and reject
    malformed bodies."""
    audio = (np.random.RandomState(7).randn(9000) * 0.1).astype(np.float32)
    status, payload = _request(server, "/v1/transcribe",
                               audio.astype("<f4").tobytes(),
                               content_type="application/octet-stream")
    assert status == 200
    assert payload["text"] == transcriber.transcribe_audio(audio)

    # rate parameter: an 8 kHz body is resampled to 16 kHz like the wav route.
    status, payload8k = _request(
        server, "/v1/transcribe", audio[::2].astype("<f4").tobytes(),
        content_type="application/octet-stream; rate=8000")
    assert status == 200
    assert isinstance(payload8k["text"], str)

    status, error = _request(server, "/v1/transcribe", b"abc",
                             content_type="application/octet-stream")
    assert status == 400  # not a multiple of 4 bytes
    bad = np.full(4000, np.nan, np.float32).tobytes()
    status, error = _request(server, "/v1/transcribe", bad,
                             content_type="application/octet-stream; rate=16000")
    assert status == 400  # non-finite samples rejected before they poison a batch


def test_resident_beam_streams_over_http(transcriber):
    """TranscriptionServer(device_streams=True, beam_mode='resident'): beam
    sessions over /v1/stream ride the in-program advance and their finals equal a
    posterior-mode server's byte-for-byte; beam_pipelined requests 501 on the
    resident pool (the handler maps create-time ValueErrors to Not Implemented —
    apt: this pool has no separate advance to pipeline); beam_mode='resident'
    without device_streams is rejected at construction."""
    audio = (np.random.RandomState(31).randn(24000) * 0.3).astype(np.float32)

    def final_over(srv):
        status, payload = _request(srv, "/v1/stream",
                                   json.dumps({"partial_decode": "beam"}).encode())
        assert status == 200
        sid = payload["session"]
        for start in range(0, len(audio), 4000):
            status, reply = _request(srv, "/v1/stream/{}".format(sid),
                                     _pcm_body(audio[start:start + 4000]))
            assert status == 200 and reply["partial"] == reply["text"]
        status, final = _request(srv, "/v1/stream/{}/finish".format(sid), b"{}")
        assert status == 200
        return final["text"]

    ref_srv = TranscriptionServer(transcriber, port=0, max_batch=4,
                                  max_wait_ms=30.0, stream_window_s=1.024,
                                  stream_margin_s=0.25, device_streams=True)
    ref_srv.start()
    try:
        expected = final_over(ref_srv)
    finally:
        ref_srv.stop()

    srv = TranscriptionServer(transcriber, port=0, max_batch=4, max_wait_ms=30.0,
                              stream_window_s=1.024, stream_margin_s=0.25,
                              device_streams=True, beam_mode="resident",
                              beam_engine="xla")
    srv.start()
    try:
        assert srv.streams.beam_mode == "resident"
        assert final_over(srv) == expected
        status, _ = _request(
            srv, "/v1/stream",
            json.dumps({"partial_decode": "beam_pipelined"}).encode())
        assert status == 501
    finally:
        srv.stop()

    with pytest.raises(ValueError, match="device_streams"):
        TranscriptionServer(transcriber, port=0, beam_mode="resident")
