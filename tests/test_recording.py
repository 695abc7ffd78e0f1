"""Recorder endpointing tests (pure array logic, no audio hardware) + plotter smoke test."""
import numpy as np
import pytest

from speechless_tpu.io import LabeledExamplePlotter, Recorder
from speechless_tpu.features import LabeledExample, SpectrogramFrequencyScale, SpectrogramType


def chunks_from(arrays):
    return iter(arrays)


class TestRecorderEndpointing:
    def make(self):
        return Recorder(silence_threshold_for_unnormalized_audio=0.03, chunk_size=4,
                        sample_rate=8, silence_until_terminate_in_s=1)

    def test_drops_first_chunk(self):
        r = self.make()
        loud = np.full(4, 0.5, np.float32)
        # First (dropped) chunk is loud noise; nothing else is loud -> empty result.
        result = r.record_from_chunks(chunks_from([loud] + [np.zeros(4, np.float32)] * 5))
        assert len(result) == 0

    def test_starts_on_first_loud_chunk_and_stops_after_silence(self):
        r = self.make()
        silent = np.zeros(4, np.float32)
        loud = np.full(4, 0.5, np.float32)
        # drop, silence..., speech, then >1s (8 samples = 2 chunks) of silence stops it
        result = r.record_from_chunks(chunks_from(
            [silent, silent, loud, loud, silent, silent, silent, loud, loud]))
        # trailing silence trimmed; the loud chunks survive, peak-normalized to 1.0
        assert len(result) == 8
        assert result.max() == pytest.approx(1.0)

    def test_trim_silence(self):
        r = self.make()
        audio = np.array([0.0, 0.01, 0.5, 0.2, 0.5, 0.01, 0.0], np.float32)
        trimmed = r._trim_silence(audio)
        np.testing.assert_allclose(trimmed, [0.5, 0.2, 0.5], atol=1e-6)

    def test_trim_all_silent(self):
        r = self.make()
        assert len(r._trim_silence(np.zeros(10, np.float32))) == 0


class TestPlotter:
    def test_save_spectrogram_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        rand = np.random.RandomState(0)
        example = LabeledExample(get_raw_audio=lambda: rand.randn(4000).astype(np.float32),
                                 id="plotme", label="hi")
        plotter = LabeledExamplePlotter(example)
        path = plotter.save_spectrogram(tmp_path)
        assert path.exists() and path.suffix == ".png"
        mel_path = plotter.save_spectrogram(tmp_path,
                                            frequency_scale=SpectrogramFrequencyScale.mel,
                                            type=SpectrogramType.power)
        assert mel_path.exists()
