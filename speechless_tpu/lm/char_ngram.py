"""Character-level n-gram LM as a dense device table, for on-device beam-search fusion.

The reference's LM fusion needs a host KenLM round-trip; a char-level n-gram over the
decode alphabet fits in device memory as a dense ``(C^(order-1), C)`` log-prob table
(order 4 over 29 characters is ~0.7M entries), so the jitted beam search can apply shallow
fusion with one table lookup per candidate — no host involvement (SURVEY.md §2b's
"on-device n-gram probability table" option).
"""
from typing import List, Sequence

import numpy as np


def context_size(alphabet_size: int, order: int) -> int:
    return alphabet_size ** (order - 1)


def char_ngram_table_from_texts(texts: Sequence[str], alphabet: List[str], order: int = 4,
                                add_k: float = 0.1) -> np.ndarray:
    """Estimate an add-k-smoothed char n-gram table from training transcripts.

    Returns ``(alphabet_size^(order-1), alphabet_size)`` float32 log10 probabilities:
    ``table[ctx, c] = log10 P(c | last order-1 chars encoded as ctx)``. Texts are padded
    (conceptually) with leading index-0 characters; contexts never observed fall back to
    the smoothed uniform distribution.
    """
    size = len(alphabet)
    index = {c: i for i, c in enumerate(alphabet)}
    counts = np.zeros((context_size(size, order), size), dtype=np.float64)
    for text in texts:
        context = 0
        for char in text:
            c = index.get(char)
            if c is None:
                context = 0
                continue
            counts[context, c] += 1.0
            context = (context * size + c) % counts.shape[0]
    smoothed = counts + add_k
    probs = smoothed / smoothed.sum(axis=1, keepdims=True)
    return np.log10(probs).astype(np.float32)


def advance_context(context, char, alphabet_size: int, order: int):
    """Rolling context update (works on ints or arrays)."""
    return (context * alphabet_size + char) % context_size(alphabet_size, order)
