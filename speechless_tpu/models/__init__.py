from . import wav2letter
from .wav2letter import (ConvSpec, Wav2LetterConfig, apply, init_params, prediction_lengths,
                         probabilities, remap_output_layer, trainable_mask)

__all__ = ["wav2letter", "Wav2LetterConfig", "ConvSpec", "apply", "init_params",
           "probabilities", "prediction_lengths", "remap_output_layer", "trainable_mask"]
