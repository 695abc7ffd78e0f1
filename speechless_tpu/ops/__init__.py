from .ctc import ctc_loss, ctc_loss_from_logits
from .decode import beam_search_decode, greedy_decode

__all__ = ["ctc_loss", "ctc_loss_from_logits", "greedy_decode", "beam_search_decode"]
