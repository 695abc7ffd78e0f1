"""AOT serving bundles (`serving_export.py`): export -> reload -> transcription parity.

The reference deploys by shipping the framework + HDF5 weights (`net.py:518-530`);
here a bundle of serialized `jax.export` programs replays with no model code."""
import json

import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_export import (ExportedTranscriber, export_transcriber)


ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")


@pytest.fixture(scope="module")
def transcriber():
    import jax
    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    return Transcriber(config, params, ALPHABET, sample_buckets=(16384, 32768))


@pytest.fixture(scope="module")
def bundle(transcriber, tmp_path_factory):
    return export_transcriber(transcriber, tmp_path_factory.mktemp("bundle"))


class TestExportRoundtrip:
    def test_bundle_layout(self, bundle):
        manifest = json.loads((bundle / "manifest.json").read_text())
        assert manifest["sample_buckets"] == [16384, 32768]
        assert manifest["allowed_characters"] == ALPHABET
        assert manifest["lm_fused"] is False
        assert (bundle / "weights-epoch0.npz").exists()
        for bucket in (16384, 32768):
            assert (bundle / "program-{}.shlo".format(bucket)).stat().st_size > 0

    def test_transcription_parity_with_live_transcriber(self, transcriber, bundle):
        loaded = ExportedTranscriber(bundle)
        rng = np.random.RandomState(0)
        for length in (9000, 16384, 20000):  # inside both buckets + exact boundary
            audio = (rng.randn(length) * 0.1).astype(np.float32)
            text, confidence = loaded.transcribe_audio_with_confidence(audio)
            live_text, live_confidence = \
                transcriber.transcribe_audio_with_confidence(audio)
            assert text == live_text
            assert confidence == pytest.approx(live_confidence, abs=1e-5)
            # Mean per-frame max posterior: bounded by the uniform floor and 1.
            assert 1.0 / (len(ALPHABET) + 1) <= confidence <= 1.0
            assert loaded.transcribe_audio(audio) == live_text

    def test_oversize_audio_raises(self, bundle):
        loaded = ExportedTranscriber(bundle)
        with pytest.raises(ValueError, match="largest exported bucket"):
            loaded.transcribe_audio(np.zeros(40000, dtype=np.float32))

    def test_bucket_subset_and_unknown_bucket(self, transcriber, tmp_path):
        out = export_transcriber(transcriber, tmp_path / "subset",
                                 sample_buckets=(16384,))
        assert json.loads((out / "manifest.json").read_text())["sample_buckets"] == [16384]
        with pytest.raises(ValueError, match="not buckets"):
            export_transcriber(transcriber, tmp_path / "bad", sample_buckets=(999,))

    def test_multi_platform_bundle_runs_here_tpu_only_refuses(self, transcriber,
                                                              tmp_path):
        out = export_transcriber(transcriber, tmp_path / "xplat",
                                 platforms=("tpu", "cpu"), sample_buckets=(16384,))
        audio = (np.random.RandomState(1).randn(9000) * 0.1).astype(np.float32)
        assert ExportedTranscriber(out).transcribe_audio(audio) == \
            transcriber.transcribe_audio(audio)

        tpu_only = export_transcriber(transcriber, tmp_path / "tpu-only",
                                      platforms=("tpu",), sample_buckets=(16384,))
        with pytest.raises(ValueError, match="exported for platforms"):
            ExportedTranscriber(tpu_only).transcribe_audio(audio)

    def test_batched_programs_roundtrip(self, transcriber, tmp_path):
        out = export_transcriber(transcriber, tmp_path / "batched",
                                 sample_buckets=(16384,), batch_sizes=(1, 4))
        loaded = ExportedTranscriber(out)
        rng = np.random.RandomState(2)
        audios = [(rng.randn(n) * 0.1).astype(np.float32)
                  for n in (9000, 12000, 16384, 5000, 7000)]  # 5 utts -> 2 dispatches
        bundle_results = loaded.transcribe_batch(audios)
        live_results = transcriber.transcribe_batch(audios, batch_size=4)
        for (text, conf), (live_text, live_conf) in zip(bundle_results, live_results):
            assert text == live_text
            assert conf == pytest.approx(live_conf, abs=1e-5)

    def test_streaming_from_bundle(self, transcriber, tmp_path):
        from speechless_tpu.serving_streaming import StreamingTranscriber
        out = export_transcriber(transcriber, tmp_path / "streaming",
                                 sample_buckets=(16384, 32768), streaming=True)
        loaded = ExportedTranscriber(out)
        assert loaded.samples_per_frame == transcriber.samples_per_frame
        audio = (np.random.RandomState(4).randn(24000) * 0.3).astype(np.float32)
        np.testing.assert_array_equal(loaded.frame_tokens(audio),
                                      transcriber.frame_tokens(audio))
        bundle_stream = StreamingTranscriber(loaded, window_s=2.0, margin_s=0.9)
        live_stream = StreamingTranscriber(transcriber, window_s=2.0, margin_s=0.9)
        assert bundle_stream.transcribe_stream(audio, 4000) == \
            live_stream.transcribe_stream(audio, 4000)

    def test_frame_tokens_requires_streaming_export(self, bundle):
        with pytest.raises(ValueError, match="no streaming programs"):
            ExportedTranscriber(bundle).frame_tokens(np.zeros(100, dtype=np.float32))

    def test_posteriors_and_alignment_from_streaming_bundle(self, transcriber,
                                                            tmp_path):
        # Streaming bundles carry per-frame posterior programs: frame_log_probs
        # parity with the live transcriber, and forced alignment (`align_audio`,
        # the CLI `align --bundle` path) works with no model code.
        from speechless_tpu.serving import align_audio
        out = export_transcriber(transcriber, tmp_path / "posteriors",
                                 sample_buckets=(16384,), streaming=True)
        loaded = ExportedTranscriber(out)
        audio = (np.random.RandomState(4).randn(12000) * 0.3).astype(np.float32)
        np.testing.assert_allclose(loaded.frame_log_probs(audio),
                                   transcriber.frame_log_probs(audio),
                                   rtol=1e-5, atol=1e-5)
        transcript = transcriber.transcribe_audio(audio)
        if transcript.strip():
            assert (align_audio(loaded, audio, transcript)
                    == align_audio(transcriber, audio, transcript))

    def test_posteriors_require_streaming_export(self, bundle):
        with pytest.raises(ValueError, match="no posterior programs"):
            ExportedTranscriber(bundle).frame_log_probs(
                np.zeros(100, dtype=np.float32))

    def test_transcribe_batch_requires_batched_export(self, bundle):
        with pytest.raises(ValueError, match="no batched programs"):
            ExportedTranscriber(bundle).transcribe_batch(
                [np.zeros(100, dtype=np.float32)])

    def test_batched_capability_is_reported(self, transcriber, bundle, tmp_path):
        """`has_batched_programs` is the capability probe callers (the `transcribe`
        CLI) use to fall back to per-file dispatches — a default bundle defines
        `transcribe_batch` but cannot run it."""
        assert transcriber.has_batched_programs is True
        assert ExportedTranscriber(bundle).has_batched_programs is False
        batched = export_transcriber(transcriber, tmp_path / "b2",
                                     sample_buckets=(16384,), batch_sizes=(1, 2))
        assert ExportedTranscriber(batched).has_batched_programs is True

    def test_long_form_from_bundle(self, transcriber, bundle):
        """Bundle long-form transcription: segments are capped at the largest exported
        bucket and the result matches the live transcriber segmenting at the same
        cap (the live default of 30 s would exceed the bundle's buckets)."""
        loaded = ExportedTranscriber(bundle)
        audio = (np.random.RandomState(7).randn(70000) * 0.1).astype(np.float32)
        cap_s = 32768 / 16000.0
        assert loaded.transcribe_long_audio(audio) == \
            transcriber.transcribe_long_audio(audio, max_segment_s=cap_s)

    def test_transcribe_cli_falls_back_without_batched_programs(self, bundle,
                                                                tmp_path, capsys):
        """`transcribe --bundle` with several files must not crash on a bundle that
        was exported without batched programs: it falls back to one dispatch per
        file. Long-form routing from a bundle works through the CLI too."""
        from conftest import make_test_wav
        from speechless_tpu.__main__ import main

        wavs = []
        for i in range(2):
            path = tmp_path / "clip{}.wav".format(i)
            make_test_wav(path, duration_s=0.4, seed=i)
            wavs.append(str(path))
        capsys.readouterr()
        main(["transcribe", "--bundle", str(bundle)] + wavs)
        lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
        assert [line.split("\t")[0] for line in lines] == wavs

        long_wav = tmp_path / "long.wav"
        make_test_wav(long_wav, duration_s=4.0, seed=3)  # > the 2.05 s largest bucket
        main(["transcribe", "--bundle", str(bundle), "--long-form", str(long_wav)])
        lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
        assert len(lines) == 1 and lines[0].split("\t")[0] == str(long_wav)

    def test_batch_sizes_must_include_one(self, transcriber, tmp_path):
        with pytest.raises(ValueError, match="include 1"):
            export_transcriber(transcriber, tmp_path / "nope", batch_sizes=(4,))

    def test_newer_format_version_rejected(self, bundle, tmp_path):
        import shutil
        copy = tmp_path / "newer"
        shutil.copytree(bundle, copy)
        manifest = json.loads((copy / "manifest.json").read_text())
        manifest["format_version"] = 99
        (copy / "manifest.json").write_text(json.dumps(manifest))
        with pytest.raises(ValueError, match="newer than this loader"):
            ExportedTranscriber(copy)


def test_lm_fused_bundle_roundtrip(tmp_path):
    """The LM-fused serving program (features -> model -> word-LM beam, HBM tables as
    program constants) exports and replays identically.

    Runs in a SUBPROCESS: this is the largest XLA:CPU compile in the suite, and
    XLA:CPU's JIT deterministically segfaults inside backend_compile_and_load once a
    few hundred compiles accumulate in one process (observed 3/3 full-suite runs,
    never standalone). A fresh interpreter makes the test order-independent by
    construction — no cache-clearing choreography against whatever ran before. TPU
    serving is unaffected (compiles run on the remote compiler)."""
    import os
    import subprocess
    import sys

    if os.environ.get("SPEECHLESS_ISOLATED_TEST") != "1":
        result = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             "{}::test_lm_fused_bundle_roundtrip".format(__file__)],
            env={**os.environ, "SPEECHLESS_ISOLATED_TEST": "1"},
            capture_output=True, text=True, timeout=1800)
        assert result.returncode == 0, \
            "isolated run failed:\n{}\n{}".format(result.stdout, result.stderr)
        return

    import jax
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory

    lm_dir = tmp_path / "kenlm"
    build_kenlm_directory(["the cat sat", "a dog ran", "the dog sat"], lm_dir,
                          allowed_characters=ALPHABET, order=3)
    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    params = w2l.init_params(config, jax.random.PRNGKey(1))
    live = Transcriber(config, params, ALPHABET, kenlm_directory=lm_dir,
                       beam_width=4, sample_buckets=(16384,))
    bundle = export_transcriber(live, tmp_path / "bundle")
    assert json.loads((bundle / "manifest.json").read_text())["lm_fused"] is True
    loaded = ExportedTranscriber(bundle)
    audio = (np.random.RandomState(3).randn(12000) * 0.1).astype(np.float32)
    assert loaded.transcribe_audio(audio) == live.transcribe_audio(audio)
