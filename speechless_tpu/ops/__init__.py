from .asg import asg_loss, asg_viterbi_decode
from .ctc import ctc_loss, ctc_loss_from_logits
from .ctc_pallas import ctc_loss_from_logits_pallas, ctc_loss_pallas
from .decode import beam_search_decode, greedy_decode
from .decode_jax import beam_search_decode_jax
from .decode_pallas import beam_search_decode_pallas
from .decode_pallas_lm import (beam_search_decode_pallas_frames,
                               beam_search_decode_pallas_lm)
from .device_beam import beam_search_decode_device
from .specaugment import SpecAugment, apply_spec_augment

__all__ = ["ctc_loss", "ctc_loss_from_logits", "ctc_loss_pallas", "ctc_loss_from_logits_pallas",
           "asg_loss", "asg_viterbi_decode", "greedy_decode", "beam_search_decode", "beam_search_decode_jax",
           "beam_search_decode_pallas", "beam_search_decode_pallas_lm",
           "beam_search_decode_pallas_frames",
           "beam_search_decode_device", "SpecAugment", "apply_spec_augment"]
