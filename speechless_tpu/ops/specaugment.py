"""On-device SpecAugment (Park et al., arXiv:1904.08779) for spectrogram batches.

Beyond-reference training augmentation: the reference trains on raw cached spectrograms
with dropout as its only regularizer (`net.py:300-305`). SpecAugment masks random
frequency bands and time spans per utterance per step — the standard ASR augmentation
since 2019 — and is a natural fit for the TPU train step: the masks are built from two
`iota` comparisons and applied as one fused elementwise multiply, so the cost is HBM
noise next to the conv stack, and the whole thing runs inside the jitted update
(composes with the multi-step `lax.scan` and the device-resident epoch program; no host
involvement, no change to the input pipeline).

Masking uses value 0.0, which after the full-matrix z-normalization contract
(features/spectrogram.py, reference `labeled_example.py:136-140`) IS the batch mean —
i.e. the paper's mean-masking, for free.

Time masks are sampled inside each utterance's true length (`input_lengths`), with the
max width a fraction of that length (the paper's adaptive p·T bound), so short
utterances are never wiped out and padding frames are untouched.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugment:
    """Parameters follow arXiv:1904.08779 (LibriSpeech "LD" policy scaled to this
    pipeline's 128 mel bins and 8 ms frames)."""
    frequency_mask_width: int = 27   # max mel bins per frequency mask (F)
    frequency_mask_count: int = 2    # masks per utterance (mF)
    time_mask_fraction: float = 0.05  # max mask width as a fraction of utterance length (p)
    time_mask_count: int = 2         # masks per utterance (mT)


def _interval_masks(rng: jax.Array, batch: int, count: int, dim: int,
                    limits: jnp.ndarray, max_widths: jnp.ndarray) -> jnp.ndarray:
    """(batch, dim) boolean: union of ``count`` random intervals per row, each of width
    uniform in [0, max_widths_b] and starting uniformly inside [0, limits_b - width]."""
    width_rng, start_rng = jax.random.split(rng)
    u_width = jax.random.uniform(width_rng, (batch, count))
    u_start = jax.random.uniform(start_rng, (batch, count))
    widths = jnp.floor(u_width * (max_widths[:, None].astype(jnp.float32) + 1.0))
    starts = jnp.floor(u_start * jnp.maximum(
        limits[:, None].astype(jnp.float32) - widths + 1.0, 1.0))
    positions = jnp.arange(dim, dtype=jnp.float32)[None, None, :]
    inside = (positions >= starts[:, :, None]) & (positions < (starts + widths)[:, :, None])
    return jnp.any(inside, axis=1)


def apply_spec_augment(rng: jax.Array, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                       config: Optional[SpecAugment] = None) -> jnp.ndarray:
    """Mask ``inputs`` (batch, time, mel) in place of the paper's time/frequency masks.

    Pure function of ``rng`` (trace-stable under `jit`/`lax.scan`); identical shapes in
    and out; padding frames beyond ``input_lengths`` are never selected by time masks.
    """
    config = config or SpecAugment()
    batch, time_dim, mel_dim = inputs.shape
    freq_rng, time_rng = jax.random.split(rng)
    ones = jnp.ones((batch,), dtype=jnp.int32)
    freq_mask = _interval_masks(
        freq_rng, batch, config.frequency_mask_count, mel_dim,
        limits=ones * mel_dim,
        max_widths=ones * min(config.frequency_mask_width, mel_dim))
    lengths = input_lengths.astype(jnp.int32)
    time_mask = _interval_masks(
        time_rng, batch, config.time_mask_count, time_dim,
        limits=lengths,
        max_widths=jnp.floor(config.time_mask_fraction * lengths.astype(jnp.float32))
        .astype(jnp.int32))
    masked = jnp.where(time_mask[:, :, None] | freq_mask[:, None, :],
                       jnp.zeros((), dtype=inputs.dtype), inputs)
    return masked
