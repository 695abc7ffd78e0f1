"""Device beam-search routing: pick the fastest kernel for the charset/LM combination.

Production call sites (`serving.py`, eval paths) should decode through
`beam_search_decode_device`, which routes:

* no LM  -> the sublane-batched frame-step Pallas kernel
  (`decode_pallas_lm.beam_search_decode_pallas_frames`, ~10x the XLA beam), unless the
  caller asks for the `skip_blank_log_prob` fast path, which only the whole-loop
  kernel (`decode_pallas.py`) can express;
* word LM -> the hybrid Pallas-step + XLA-gather beam (`decode_pallas_lm.py`);
* char-table LM, unpruned search, or a charset too large for the packed 128-lane
  frame row (``classes + 2*prune > 128``) -> the XLA beam (`decode_jax.py`), with a
  log line instead of the round-2 ValueError so any charset decodes through the
  public API.

All paths share one output contract: ``(tokens (B, max_len) int32 -1-padded,
counts (B,))``, token-parity-tested against each other.
"""
import logging
from typing import Optional, Tuple

import jax.numpy as jnp

from .decode_jax import beam_search_decode_jax
from .decode_pallas import FRAME_LANES, beam_search_decode_pallas
from .decode_pallas_lm import (beam_search_decode_pallas_frames,
                               beam_search_decode_pallas_lm)

logger = logging.getLogger(__name__)


def pallas_beam_supported(class_count: int, prune_classes: Optional[int]) -> bool:
    """The Pallas kernels pack (top-k scores, top-k chars, the full frame) into one
    128-lane row per frame: classes + 2*min(k, classes) must fit."""
    if prune_classes is None:
        return False  # unpruned search: the packed row cannot hold k = classes twice
    return class_count + 2 * min(prune_classes, class_count) <= FRAME_LANES


def beam_search_decode_device(log_probs: jnp.ndarray, lengths: jnp.ndarray, blank: int,
                              beam_width: int = 25, max_decoded_length: int = 256,
                              prune_classes: Optional[int] = 8,
                              word_lm=None, lm_table: jnp.ndarray = None,
                              lm_weight: float = 0.8,
                              word_count_weight: float = 0.0,
                              valid_word_count_weight: float = 2.3,
                              skip_blank_log_prob: Optional[float] = None,
                              lexicon_constrained: bool = False,
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC prefix beam search, routed to the fastest available path.

    Same arguments and output contract as `decode_jax.beam_search_decode_jax`; see the
    module docstring for the routing rules. Ref: the reference decodes through a single
    TF op regardless of LM (`/root/reference/speechless/net.py:431-451`) — here the
    device kernel is picked per configuration.
    """
    class_count = log_probs.shape[-1]
    if lexicon_constrained:
        # Reject unsupported combinations here, where the conflict can be named,
        # instead of silently dropping an option or failing deep in the XLA beam.
        if skip_blank_log_prob is not None:
            raise ValueError("skip_blank_log_prob is not supported with "
                             "lexicon_constrained (only the whole-loop Pallas kernel "
                             "implements blank skipping, and it has no trie mask)")
        if lm_table is not None:
            raise ValueError("lexicon_constrained needs a word-level LM (word_lm): "
                             "the vocabulary trie rides in the word LM, which a "
                             "char-table LM (lm_table) does not carry")
        # Only the XLA beam implements trie-constrained extensions; the Pallas hybrid's
        # packed frame row has no slot for the per-candidate trie mask.
        return beam_search_decode_jax(
            log_probs, lengths, blank, beam_width=beam_width,
            max_decoded_length=max_decoded_length, word_lm=word_lm,
            lm_weight=lm_weight, word_count_weight=word_count_weight,
            valid_word_count_weight=valid_word_count_weight,
            prune_classes=prune_classes, lexicon_constrained=True)
    if lm_table is not None or not pallas_beam_supported(class_count, prune_classes):
        if lm_table is None:
            logger.info(
                "device beam: %d classes + 2*%s pruned exceeds the %d-lane packed "
                "frame row (or pruning disabled); using the XLA beam",
                class_count, prune_classes, FRAME_LANES)
        return beam_search_decode_jax(
            log_probs, lengths, blank, beam_width=beam_width,
            max_decoded_length=max_decoded_length, lm_table=lm_table,
            lm_weight=lm_weight, word_lm=word_lm,
            word_count_weight=word_count_weight,
            valid_word_count_weight=valid_word_count_weight,
            prune_classes=prune_classes)
    if word_lm is not None:
        return beam_search_decode_pallas_lm(
            log_probs, lengths, blank, word_lm, beam_width=beam_width,
            max_decoded_length=max_decoded_length, lm_weight=lm_weight,
            word_count_weight=word_count_weight,
            valid_word_count_weight=valid_word_count_weight,
            prune_classes=prune_classes)
    if skip_blank_log_prob is not None:
        # Only the whole-loop kernel can skip blank-dominated frames per utterance.
        return beam_search_decode_pallas(
            log_probs, lengths, blank, beam_width=beam_width,
            max_decoded_length=max_decoded_length, prune_classes=prune_classes,
            skip_blank_log_prob=skip_blank_log_prob)
    return beam_search_decode_pallas_frames(
        log_probs, lengths, blank, beam_width=beam_width,
        max_decoded_length=max_decoded_length, prune_classes=prune_classes)
