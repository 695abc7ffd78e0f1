"""CLI end-to-end tests: the real `python -m speechless_tpu` argument surface driven
in-process against a synthetic dev-clean corpus (no network: the tree pre-exists, so the
LibriSpeech downloader is never triggered)."""
import numpy as np
import pytest

from speechless_tpu.__main__ import main

from test_corpus import make_librispeech_tree


@pytest.fixture
def data_dir(tmp_path):
    # minimal_english expects corpus/English/dev-clean/...
    make_librispeech_tree(tmp_path / "corpus" / "English" / "dev-clean",
                          ["hello there", "nice day", "good one"])
    return tmp_path


class TestCli:
    def test_train_and_validate_roundtrip(self, data_dir):
        main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--epochs", "1", "--batch-size", "2", "--batches-per-epoch", "2"])
        nets = data_dir / "nets"
        runs = [d.name for d in nets.iterdir()]
        assert len(runs) == 1
        assert (nets / runs[0] / "weights-epoch1.npz").exists()

        csv_file = data_dir / "sweep.csv"
        main(["validate", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--batch-size", "2", "--run", runs[0], "--csv", str(csv_file)])
        lines = csv_file.read_text().strip().splitlines()
        assert len(lines) == 2 and lines[1].startswith("1,")

        main(["test", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--batch-size", "2", "--run", runs[0], "--epoch", "1"])

    def test_train_device_resident_flag_routes(self, data_dir, monkeypatch):
        """--device-resident reaches system.Wav2Letter.train as the packed-corpus kwargs
        (the full device-resident path is exercised on a small model in
        test_device_dataset.py; compiling the whole-epoch scan over the 23M-param model
        is a TPU job, not a CPU unit test)."""
        captured = {}

        def fake_train(self, batches, **kwargs):
            captured.update(kwargs)

        from speechless_tpu.system import Wav2Letter
        monkeypatch.setattr(Wav2Letter, "train", fake_train)
        main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--epochs", "1", "--batch-size", "2", "--batches-per-epoch", "2",
              "--device-resident"])
        assert captured["batch_size"] == 2
        assert len(captured["device_resident_examples"]) == 3  # the training corpus

    def test_train_spec_augment_and_clip_flags(self, data_dir):
        # E2E: the augmented + clipped train step runs for a real epoch and checkpoints.
        main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--epochs", "1", "--batch-size", "2", "--batches-per-epoch", "2",
              "--spec-augment", "--clip-norm", "0.5"])
        runs = list((data_dir / "nets").iterdir())
        assert len(runs) == 1
        assert (runs[0] / "weights-epoch1.npz").exists()

    def test_test_decoder_weight_flags_route(self, data_dir, monkeypatch):
        from speechless_tpu.configuration import Configuration
        captured = {}

        class _StubModel:
            pass

        def fake_load_model(self, **kwargs):
            captured.update(kwargs)
            return _StubModel()

        monkeypatch.setattr(Configuration, "load_model", fake_load_model)
        monkeypatch.setattr(Configuration, "test_model_grouped_by_loaded_corpus_name",
                            lambda self, model: None)
        main(["test", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--run", "r", "--epoch", "3", "--kenlm", "--beam-width", "50",
              "--lm-weight", "2.4", "--valid-word-count-weight", "4.0"])
        assert captured["use_kenlm"] is True
        assert captured["beam_width"] == 50
        assert captured["lm_weight"] == 2.4
        assert captured["valid_word_count_weight"] == 4.0
        assert "word_count_weight" not in captured  # unset flags keep the default

    def test_decoder_weight_flags_without_kenlm_exit(self, data_dir):
        # Greedy decode would silently ignore them; the CLI refuses instead.
        with pytest.raises(SystemExit, match="require --kenlm"):
            main(["test", "--config", "minimal_english", "--data-dir", str(data_dir),
                  "--run", "r", "--epoch", "1", "--lm-weight", "2.4"])

    def test_transfer_training_flags_route(self, data_dir, monkeypatch):
        from speechless_tpu.configuration import Configuration
        captured = {}

        def fake_transfer(self, **kwargs):
            captured.update(kwargs)

        monkeypatch.setattr(Configuration, "train_transfer_from_best_english_model",
                            fake_transfer)
        main(["transfer", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--freeze", "8", "--spec-augment", "--clip-norm", "1.0"])
        assert captured["frozen_layer_count"] == 8
        assert captured["wav2letter_kwargs"] == {"spec_augment": True,
                                                 "gradient_clip_norm": 1.0}

    def test_summarize_and_fill_cache(self, data_dir):
        main(["summarize", "--config", "minimal_english", "--data-dir", str(data_dir)])
        assert (data_dir / "corpus" / "English" / "corpus.csv").exists()
        assert (data_dir / "corpus" / "English" / "summary.csv").exists()
        main(["fill-cache", "--config", "minimal_english", "--data-dir", str(data_dir)])
        cached = list((data_dir / "spectrogram-cache" / "English").glob("*.npy"))
        assert len(cached) == 3

    def test_export_bundle_roundtrip(self, data_dir):
        main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--epochs", "1", "--batch-size", "2", "--batches-per-epoch", "2"])
        run = next((data_dir / "nets").iterdir()).name
        out = data_dir / "bundle"
        main(["export", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--run", run, "--epoch", "1", "--out", str(out),
              "--batch-sizes", "1", "2"])
        assert (out / "manifest.json").exists()
        assert (out / "weights-epoch0.npz").exists()
        assert list(out.glob("program-*-b2.shlo"))
        from speechless_tpu.serving_export import ExportedTranscriber
        loaded = ExportedTranscriber(out)
        audio = (np.random.RandomState(0).randn(8000) * 0.1).astype(np.float32)
        assert isinstance(loaded.transcribe_audio(audio), str)
        assert len(loaded.transcribe_batch([audio, audio, audio])) == 3

    def test_transcribe_files(self, data_dir, tmp_path, capsys):
        """`transcribe`: checkpoint-backed offline file transcription — plain and JSON
        (+timestamps) output, batched multi-file path."""
        import json

        from conftest import make_test_wav

        main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--epochs", "1", "--batch-size", "2", "--batches-per-epoch", "2"])
        run = next((data_dir / "nets").iterdir()).name
        wavs = []
        for i in range(3):
            path = tmp_path / "clip{}.wav".format(i)
            make_test_wav(path, duration_s=0.4, seed=i)
            wavs.append(str(path))
        capsys.readouterr()

        main(["transcribe", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--run", run, "--epoch", "1"] + wavs)
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith(str(tmp_path))]
        assert len(lines) == 3
        assert all(line.split("\t")[0] == wav for line, wav in zip(lines, wavs))

        main(["transcribe", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--run", run, "--epoch", "1", "--json", "--timestamps", wavs[0]])
        records = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
                   if l.startswith("{")]
        assert len(records) == 1
        assert records[0]["file"] == wavs[0] and "words" in records[0]
        for word in records[0]["words"]:
            assert 0 <= word["start_s"] < word["end_s"]

        # Multi-file timestamps ride the batched frame-token path (one dispatch per
        # bucket group, not one per file); per-file output order is preserved.
        main(["transcribe", "--config", "minimal_english", "--data-dir", str(data_dir),
              "--run", run, "--epoch", "1", "--json", "--timestamps"] + wavs)
        records = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
                   if l.startswith("{")]
        assert [r["file"] for r in records] == wavs
        assert all("words" in r for r in records)

    def test_transcribe_timestamps_require_json(self, data_dir, tmp_path):
        from conftest import make_test_wav
        wav = tmp_path / "c.wav"
        make_test_wav(wav)
        with pytest.raises(SystemExit, match="requires --json"):
            main(["transcribe", "--data-dir", str(data_dir), "--run", "r",
                  "--epoch", "1", "--timestamps", str(wav)])

    def test_lr_schedule_flags_cross_validated_at_parse_time(self, data_dir):
        # Both halves of the pair fail fast, before any corpus or model work.
        with pytest.raises(SystemExit):
            main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
                  "--lr-decay", "cosine"])
        with pytest.raises(SystemExit):
            main(["train", "--config", "minimal_english", "--data-dir", str(data_dir),
                  "--lr-decay-steps", "100"])

    def test_transcribe_requires_exactly_one_model_source(self, data_dir, tmp_path):
        wav = tmp_path / "c.wav"
        from conftest import make_test_wav
        make_test_wav(wav)
        with pytest.raises(SystemExit, match="exactly one of"):
            main(["transcribe", "--data-dir", str(data_dir), str(wav)])

    def test_serve_requires_exactly_one_model_source(self, data_dir):
        with pytest.raises(SystemExit, match="exactly one of"):
            main(["serve", "--data-dir", str(data_dir)])
        with pytest.raises(SystemExit, match="exactly one of"):
            main(["serve", "--data-dir", str(data_dir), "--bundle", "b", "--run", "r"])
        with pytest.raises(SystemExit, match="requires --epoch"):
            main(["serve", "--data-dir", str(data_dir), "--run", "r"])

    def test_lexicon_with_bundle_exits(self, data_dir, tmp_path):
        """AOT bundles bake the decoder at export time — --lexicon would be silently
        ignored, so both CLI surfaces must reject the combination up front."""
        wav = tmp_path / "d.wav"
        from conftest import make_test_wav
        make_test_wav(wav)
        with pytest.raises(SystemExit, match="live checkpoint"):
            main(["serve", "--data-dir", str(data_dir), "--bundle", "b", "--lexicon"])
        with pytest.raises(SystemExit, match="live checkpoint"):
            main(["transcribe", "--data-dir", str(data_dir), "--bundle", "b",
                  "--lexicon", str(wav)])

    def test_unknown_config_exits(self, data_dir):
        with pytest.raises(SystemExit):
            main(["train", "--config", "bogus", "--data-dir", str(data_dir)])
