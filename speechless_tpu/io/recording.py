"""Microphone recording with silence-based endpointing.

Re-provides `/root/reference/speechless/recording.py`: capture fp32 16kHz chunks, drop the
first (often a click), start at the first non-silent chunk, stop after 3s of silence, trim
leading/trailing silence, peak-normalize, write a wav, and wrap into a `LabeledExample`.

The endpointing logic is pure (testable on arrays); capture is a thin layer over whichever
backend exists (`sounddevice` or `pyaudio`), gated at call time since neither is guaranteed
in a headless image.
"""
from pathlib import Path
from typing import Callable, Iterator, List, Optional

import numpy as np

from ..features.audio_io import write_wav
from ..features.example import LabeledExample, LabeledExampleFromFile
from ..utils.tools import mkdir, timestamp


class Recorder:
    def __init__(self,
                 silence_threshold_for_unnormalized_audio: float = 0.03,
                 chunk_size: int = 1024,
                 sample_rate: int = 16000,
                 silence_until_terminate_in_s: int = 3):
        self.silence_threshold = silence_threshold_for_unnormalized_audio
        self.chunk_size = chunk_size
        self.sample_rate = sample_rate
        self.silence_until_terminate_in_s = silence_until_terminate_in_s

    # -- pure endpointing logic ------------------------------------------

    def _is_silent(self, chunk: np.ndarray) -> bool:
        return np.max(chunk) < self.silence_threshold

    def _trim_silence(self, audio: np.ndarray) -> np.ndarray:
        above = np.flatnonzero(audio >= self.silence_threshold)
        if len(above) == 0:
            return np.array([], dtype=audio.dtype)
        return audio[above[0]: above[-1] + 1]

    def _normalize(self, audio: np.ndarray) -> np.ndarray:
        return audio / np.max(np.abs(audio))

    def record_from_chunks(self, chunks: Iterator[np.ndarray]) -> np.ndarray:
        """Endpointing state machine over a chunk stream (the testable core).

        Drops the first chunk, starts recording at the first non-silent chunk, stops after
        ``silence_until_terminate_in_s`` of consecutive silence, then trims + normalizes.
        """
        collected: List[np.ndarray] = []
        silent_chunk_count = 0
        has_recording_started = False
        first_chunk_dropped = False
        max_silent_samples = self.silence_until_terminate_in_s * self.sample_rate

        for chunk in chunks:
            if not first_chunk_dropped:  # often loud interface noise
                first_chunk_dropped = True
                continue
            collected.append(np.asarray(chunk, dtype=np.float32))
            silent = self._is_silent(collected[-1])
            if has_recording_started:
                if silent:
                    silent_chunk_count += 1
                    if silent_chunk_count * self.chunk_size > max_silent_samples:
                        break
                else:
                    silent_chunk_count = 0
            elif not silent:
                has_recording_started = True

        if not collected:
            return np.array([], dtype=np.float32)
        trimmed = self._trim_silence(np.concatenate(collected))
        if len(trimmed) == 0:
            return trimmed
        return self._normalize(trimmed)

    # -- capture backends -------------------------------------------------

    def _microphone_chunks(self) -> Iterator[np.ndarray]:
        # Any sounddevice setup failure (missing package, missing libportaudio -> OSError,
        # no capture device -> PortAudioError) falls back to pyaudio; errors mid-stream
        # (after capture started) propagate.
        stream_cm = None
        try:
            import sounddevice

            stream_cm = sounddevice.InputStream(samplerate=self.sample_rate, channels=1,
                                                dtype="float32",
                                                blocksize=self.chunk_size)
            stream_cm.__enter__()
        except Exception:
            stream_cm = None
        if stream_cm is not None:
            try:
                while True:
                    chunk, _ = stream_cm.read(self.chunk_size)
                    yield chunk[:, 0]
            finally:
                stream_cm.__exit__(None, None, None)
        try:
            import pyaudio

            audio = pyaudio.PyAudio()
            stream = audio.open(format=pyaudio.paFloat32, channels=1,
                                rate=self.sample_rate, input=True,
                                frames_per_buffer=self.chunk_size)
            try:
                while True:
                    raw = stream.read(self.chunk_size)
                    yield np.frombuffer(raw, dtype=np.float32)
            finally:
                stream.stop_stream()
                stream.close()
                audio.terminate()
        except ImportError:
            raise RuntimeError(
                "No audio capture backend available (install sounddevice or pyaudio).")

    def record(self) -> np.ndarray:
        """Record from the microphone until trailing silence; returns normalized audio."""
        print("Wait in silence to begin recording; wait in silence to terminate")
        result = self.record_from_chunks(self._microphone_chunks())
        print("Stopped recording.")
        return result

    def record_to_file(self, path: Path) -> LabeledExample:
        """Record and write to ``path``; returns a labeled example for analysis."""
        write_wav(path, self.record(), self.sample_rate)
        return LabeledExampleFromFile(path)


def record_plot_and_save(recorder: Optional[Recorder] = None,
                         recording_directory: Optional[Path] = None) -> LabeledExample:
    from ..configuration import default_data_directories
    from .plotting import LabeledExamplePlotter

    if recorder is None:
        recorder = Recorder()
    if recording_directory is None:
        recording_directory = default_data_directories.recording_directory
    mkdir(recording_directory)
    name = "recording-{}".format(timestamp())
    example = recorder.record_to_file(Path(recording_directory) / "{}.wav".format(name))
    LabeledExamplePlotter(example).save_spectrogram(recording_directory)
    return example
