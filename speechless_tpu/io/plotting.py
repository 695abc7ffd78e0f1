"""Spectrogram/waveform plotting (matplotlib, lazily imported).

Re-provides `/root/reference/speechless/labeled_example_plotter.py`: spectrogram images for
every (type x frequency scale) combination with mel axis labeling, raw-audio and
istft-reconstruction plots, and reconstruction wav export.
"""
from pathlib import Path
from textwrap import wrap
from typing import Optional

import numpy as np

from ..features import spectrogram as sg
from ..features.audio_io import write_wav
from ..features.example import (LabeledExample, SpectrogramFrequencyScale, SpectrogramType)


def _hz_to_mel_htk(frequencies):
    return 2595.0 * np.log10(1.0 + np.asarray(frequencies, dtype=float) / 700.0)


def _mel_to_hz_htk(mels):
    return 700.0 * (10.0 ** (np.asarray(mels, dtype=float) / 2595.0) - 1.0)


class LabeledExamplePlotter:
    def __init__(self, example: LabeledExample):
        self.example = example

    def _plot_audio(self, audio: np.ndarray) -> None:
        import matplotlib.pyplot as plt

        plt.title(str(self.example))
        plt.xlabel("time / samples (sample rate {}Hz)".format(self.example.sample_rate))
        plt.ylabel("y")
        plt.plot(audio)
        plt.show()

    def plot_raw_audio(self) -> None:
        self._plot_audio(self.example.get_raw_audio())

    def plot_reconstructed_audio_from_spectrogram(self) -> None:
        self._plot_audio(self.example.reconstructed_audio_from_spectrogram())

    def save_reconstructed_audio_from_spectrogram(self, target_directory: Path) -> None:
        write_wav(
            Path(target_directory) / "{}_window{}_hop{}.wav".format(
                self.example.id, self.example.fourier_window_length,
                self.example.hop_length),
            self.example.reconstructed_audio_from_spectrogram(), self.example.sample_rate)

    def prepare_spectrogram_plot(
            self, type: SpectrogramType = SpectrogramType.power_level,
            frequency_scale: SpectrogramFrequencyScale = SpectrogramFrequencyScale.linear
    ) -> None:
        import matplotlib.pyplot as plt
        from matplotlib.ticker import FuncFormatter, ScalarFormatter

        spectrogram = self.example.spectrogram(type, frequency_scale=frequency_scale)
        figure, axes = plt.subplots(1, 1)
        use_mel = frequency_scale == SpectrogramFrequencyScale.mel

        plt.title("\n".join(wrap("{}{} spectrogram for {}".format(
            "mel " if use_mel else "", type.value, str(self.example)), width=100)))
        plt.xlabel("time (data every {}ms)".format(
            round(1000 / self.example.time_step_rate())))
        plt.ylabel("frequency (data evenly distributed on {} scale, {} total)".format(
            frequency_scale.value, spectrogram.shape[0]))

        mel_frequencies = self.example.mel_frequencies()
        plt.imshow(spectrogram, cmap="gist_heat", origin="lower", aspect="auto", extent=[
            0, self.example.duration_in_s,
            float(_hz_to_mel_htk(mel_frequencies[0])) if use_mel else 0,
            float(_hz_to_mel_htk(mel_frequencies[-1])) if use_mel
            else self.example.highest_detectable_frequency()])
        plt.colorbar(label="{} ({})".format(
            type.value,
            "in{} dB, not aligned to a particular base level".format(
                " something similar to" if use_mel else "")
            if type == SpectrogramType.power_level else "only proportional to physical scale"))

        class ScalarFormatterWithUnit(ScalarFormatter):
            def __init__(self, unit: str):
                super().__init__()
                self.unit = unit

            def __call__(self, x, pos=None) -> str:
                return super().__call__(x, pos) + self.unit

        axes.xaxis.set_major_formatter(ScalarFormatterWithUnit("s"))
        axes.yaxis.set_major_formatter(
            FuncFormatter(lambda value, pos: "{}mel = {}Hz".format(
                int(value), int(_mel_to_hz_htk(value)))) if use_mel
            else ScalarFormatterWithUnit("Hz"))
        figure.set_size_inches(19.20, 10.80)

    def show_spectrogram(self, type: SpectrogramType = SpectrogramType.power_level) -> None:
        import matplotlib.pyplot as plt

        self.prepare_spectrogram_plot(type)
        plt.show()

    def save_spectrogram(
            self, target_directory: Path,
            type: SpectrogramType = SpectrogramType.power_level,
            frequency_scale: SpectrogramFrequencyScale = SpectrogramFrequencyScale.linear
    ) -> Path:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self.prepare_spectrogram_plot(type, frequency_scale)
        path = Path(target_directory) / "{}_{}{}_spectrogram.png".format(
            self.example.id, "mel_" if frequency_scale == SpectrogramFrequencyScale.mel else "",
            type.value.replace(" ", "_"))
        plt.savefig(str(path))
        plt.close("all")
        return path

    def save_spectrograms_of_all_types(self, target_directory: Path) -> None:
        for type in SpectrogramType:
            for frequency_scale in SpectrogramFrequencyScale:
                self.save_spectrogram(target_directory=target_directory, type=type,
                                      frequency_scale=frequency_scale)
