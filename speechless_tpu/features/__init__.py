from .example import (CachedLabeledSpectrogram, LabeledExample, LabeledExampleFromFile,
                      LabeledSpectrogram, PositionalLabel, SpectrogramFrequencyScale,
                      SpectrogramType, z_normalize)
from .spectrogram import (features_batch, features_from_padded, frame_count, mel_filterbank,
                          mel_frequencies, z_normalized_transposed_spectrogram)

__all__ = ["LabeledSpectrogram", "LabeledExample", "LabeledExampleFromFile",
           "CachedLabeledSpectrogram", "PositionalLabel", "SpectrogramType",
           "SpectrogramFrequencyScale", "z_normalize", "features_batch", "features_from_padded",
           "frame_count", "mel_filterbank", "mel_frequencies",
           "z_normalized_transposed_spectrogram"]
