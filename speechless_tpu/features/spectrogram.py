"""Mel power-level spectrogram features, TPU-native.

Re-provides the reference DSP pipeline (`/root/reference/speechless/labeled_example.py:99-160`)
without librosa, as a jitted JAX computation built from MXU-friendly matmuls:

    wav -> center-reflect pad -> hann frames -> |rfft|^2 (DFT as matmul)
        -> dB with floor -150 -> mel filterbank matmul -> z-normalize -> (time, mel)

Reference semantics preserved exactly (they are the cache/LER parity contract):

* STFT: ``n_fft=512, hop=128``, periodic hann window, ``center=True`` with *reflect* padding
  (the librosa default of the reference's era).
* power level: ``10*log10(power)`` floored at −150 dB, with exact zeros mapping to −150
  (`labeled_example.py:151-160`).
* **mel is applied to the dB values** — the reference converts to power level first and then
  multiplies by the mel filterbank (`labeled_example.py:120-134`), unlike the usual
  mel-then-dB order. We match it.
* mel filterbank: slaney scale + slaney area normalization, ``fmin=0, fmax=sr/2``
  (librosa ``filters.mel`` defaults, `labeled_example.py:112-115`).
* z-normalization over the full (mel, time) matrix with population std (numpy default ddof=0,
  `labeled_example.py:28-29`).

The batched entry point takes a zero-padded ``(batch, samples)`` matrix plus true lengths and
produces statically-shaped ``(batch, frames, mel)`` features with per-example masked
normalization — this is the train-time on-device path (no host DSP, no dynamic shapes).
"""
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 512
HOP_LENGTH = 128
MEL_COUNT = 128
MIN_DECIBEL = -150.0


def hz_to_mel_slaney(frequencies: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
                    mels)
    return mels


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_frequencies(n_mels: int, fmin: float = 0.0, fmax: float = SAMPLE_RATE / 2) -> np.ndarray:
    """``n_mels`` frequencies evenly spaced on the slaney mel scale (librosa-compatible)."""
    mels = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels)
    return mel_to_hz_slaney(mels)


@lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int = SAMPLE_RATE, n_fft: int = N_FFT,
                   n_mels: int = MEL_COUNT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape ``(n_mels, 1 + n_fft//2)``."""
    fft_frequencies = np.linspace(0.0, sample_rate / 2, 1 + n_fft // 2)
    mel_f = mel_frequencies(n_mels + 2, fmin=0.0, fmax=sample_rate / 2)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_frequencies[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization.
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float64)


@lru_cache(maxsize=None)
def _hann_window(n_fft: int) -> np.ndarray:
    """Periodic (fftbins=True) hann window of length ``n_fft``."""
    k = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n_fft)).astype(np.float64)


@lru_cache(maxsize=None)
def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag rfft bases combined with the hann window: two ``(n_fft, 1+n_fft//2)`` matrices.

    ``frames @ cos`` and ``frames @ sin`` give Re/−Im of the windowed rfft, so the whole STFT
    is two MXU matmuls.
    """
    n_freq = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    window = _hann_window(n_fft)[:, None]
    return (np.cos(angle) * window, np.sin(angle) * window)


def frame_count(num_samples: int, hop_length: int = HOP_LENGTH) -> int:
    """Number of STFT frames for a centered transform: ``1 + num_samples // hop``."""
    return 1 + num_samples // hop_length


def _reflect_index(positions: jnp.ndarray, lengths: jnp.ndarray,
                   max_len: int) -> jnp.ndarray:
    """Multi-bounce reflect indices (numpy ``pad(mode='reflect')`` semantics, no edge
    repetition) for per-example dynamic lengths; handles signals shorter than the pad."""
    period = jnp.maximum(2 * lengths[:, None] - 2, 1)
    folded = jnp.mod(jnp.abs(positions), period)
    folded = jnp.where(folded >= lengths[:, None], period - folded, folded)
    return jnp.clip(folded, 0, max_len - 1)


def _reflect_pad_batch(wavs: jnp.ndarray, lengths: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Centered reflect padding with per-example dynamic lengths, cheap on the hot path.

    Only the two ``pad``-sample edges need gathers ((B, pad) each, exact multi-bounce
    reflection so sub-pad-length signals stay correct); the interior is a plain concat,
    and the right mirror lands via one `dynamic_update_slice` per row (vmapped). This
    replaces a full-signal gather that dominated the feature time on TPU (~100ms at
    B=64 x 8.2s).
    """
    batch, max_len = wavs.shape
    k = jnp.arange(pad)[None, :]
    left_src = _reflect_index(k - pad, lengths, max_len)         # positions -pad..-1
    left = jnp.take_along_axis(wavs, left_src, axis=1)
    body = jnp.concatenate([left, wavs, jnp.zeros((batch, pad), wavs.dtype)], axis=1)

    right_src = _reflect_index(lengths[:, None] + k, lengths, max_len)  # positions L..L+pad-1
    right = jnp.take_along_axis(wavs, right_src, axis=1)

    def place(row, vals, length):
        return jax.lax.dynamic_update_slice(row, vals, (length + pad,))

    return jax.vmap(place)(body, right, lengths)


@lru_cache(maxsize=None)
def _dft_conv_kernel(n_fft: int) -> np.ndarray:
    """Windowed DFT bases as a conv kernel (n_fft, 1, 2*(1+n_fft//2)): [cos | sin]."""
    cos_m, sin_m = _dft_matrices(n_fft)
    return np.concatenate([cos_m, sin_m], axis=1)[:, None, :].astype(np.float32)


def _features_core(wavs: jnp.ndarray, lengths: jnp.ndarray, n_fft: int, hop_length: int,
                   n_mels: int, sample_rate: int) -> jnp.ndarray:
    """Batched fused pipeline: reflect pad -> strided DFT conv (MXU) -> power -> dB ->
    mel matmul -> masked per-example z-norm. All f32 with HIGHEST matmul precision (TPU
    f32 matmuls otherwise run reduced-precision, breaking librosa parity)."""
    batch, max_len = wavs.shape
    pad = n_fft // 2
    max_frames = frame_count(max_len, hop_length)

    padded = _reflect_pad_batch(wavs.astype(jnp.float32), lengths, pad)

    if n_fft % hop_length == 0:
        # Framing via n_fft/hop shifted strided views + one plain matmul: measured ~2x
        # faster than the equivalent strided convolution on v5e (the conv lowers to a less
        # efficient schedule), with bit-identical results.
        shifts = n_fft // hop_length
        views = [jax.lax.slice_in_dim(padded, j * hop_length,
                                      j * hop_length + max_frames * hop_length, axis=1)
                 .reshape(batch, max_frames, hop_length) for j in range(shifts)]
        frames = jnp.concatenate(views, axis=2)  # (B, T, n_fft)
        kernel = jnp.asarray(_dft_conv_kernel(n_fft))[:, 0, :]  # (n_fft, 2*n_freq)
        spectrum = jnp.einsum("btk,kf->btf", frames, kernel,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)  # (B, T, 2*n_freq)
    else:
        kernel = jnp.asarray(_dft_conv_kernel(n_fft))  # (n_fft, 1, 2*n_freq)
        spectrum = jax.lax.conv_general_dilated(
            padded[:, :, None], kernel, window_strides=(hop_length,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    n_freq = 1 + n_fft // 2
    power = spectrum[..., :n_freq] ** 2 + spectrum[..., n_freq:] ** 2

    decibel = jnp.where(power > 0.0,
                        jnp.maximum(10.0 * jnp.log10(jnp.maximum(power, 1e-45)), MIN_DECIBEL),
                        MIN_DECIBEL)

    mel_w = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels).T, dtype=jnp.float32)
    mel_db = jnp.dot(decibel, mel_w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (B, T, n_mels)

    valid_frames = (1 + lengths // hop_length)[:, None, None]
    frame_mask = jnp.arange(max_frames)[None, :, None] < valid_frames  # (B, T, 1)
    count = (valid_frames * n_mels).astype(jnp.float32)
    masked = jnp.where(frame_mask, mel_db, 0.0)
    mean = jnp.sum(masked, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.where(frame_mask, (mel_db - mean) ** 2, 0.0),
                  axis=(1, 2), keepdims=True) / count
    # Zero-variance guard: a silent utterance in a batch must not NaN-poison gradients.
    normalized = (mel_db - mean) * jax.lax.rsqrt(jnp.maximum(var, 1e-20))
    return jnp.where(frame_mask, normalized, 0.0)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_mels", "sample_rate", "max_frames"))
def features_from_padded(wav: jnp.ndarray, length: jnp.ndarray,
                         n_fft: int = N_FFT, hop_length: int = HOP_LENGTH,
                         n_mels: int = MEL_COUNT, sample_rate: int = SAMPLE_RATE,
                         max_frames: Optional[int] = None) -> jnp.ndarray:
    """Features for one zero-padded wav with true sample count ``length``.

    Returns ``(max_frames, n_mels)`` float32; frames at or beyond ``1 + length//hop`` are zero.
    z-normalization statistics are computed over valid frames only, so the result for the
    valid region is identical to the unpadded computation.
    """
    wav = jnp.asarray(wav, dtype=jnp.float32)
    result = _features_core(wav[None], jnp.asarray(length)[None].astype(jnp.int32),
                            n_fft, hop_length, n_mels, sample_rate)[0]
    if max_frames is not None and result.shape[0] > max_frames:
        result = result[:max_frames]
    elif max_frames is not None and result.shape[0] < max_frames:
        result = jnp.pad(result, ((0, max_frames - result.shape[0]), (0, 0)))
    return result


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_mels", "sample_rate"))
def features_batch(wavs: jnp.ndarray, lengths: jnp.ndarray,
                   n_fft: int = N_FFT, hop_length: int = HOP_LENGTH,
                   n_mels: int = MEL_COUNT,
                   sample_rate: int = SAMPLE_RATE) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused feature extraction on device.

    Args:
      wavs: ``(batch, max_samples)`` zero-padded float32 audio at 16 kHz.
      lengths: ``(batch,)`` true sample counts.
    Returns:
      ``(features (batch, max_frames, n_mels) float32, frame_counts (batch,) int32)``.
    """
    lengths = lengths.astype(jnp.int32)
    feats = _features_core(wavs, lengths, n_fft, hop_length, n_mels, sample_rate)
    return feats, (1 + lengths // hop_length).astype(jnp.int32)


def z_normalized_transposed_spectrogram(wav: np.ndarray, n_fft: int = N_FFT,
                                        hop_length: int = HOP_LENGTH,
                                        n_mels: int = MEL_COUNT,
                                        sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Single-utterance feature extraction (the `LabeledSpectrogram` contract,
    `labeled_example.py:136-140`): returns ``(time, mel)`` float32 array.

    Runs in pure numpy: this is the host path (disk-cache fill uses forked worker
    processes, which must not touch the JAX backend; it also avoids competing with
    training for the device). The batched on-device path (`features_batch`) is
    parity-tested against this implementation.
    """
    level = power_level_spectrogram(np.asarray(wav, dtype=np.float32), n_fft, hop_length)
    mel_db = mel_filterbank(sample_rate, n_fft, n_mels) @ level
    # Zero-variance guard: constant audio (silent clips exist in real corpora) must yield
    # zero features, not NaNs that poison training.
    normalized = (mel_db - mel_db.mean()) / max(float(mel_db.std()), 1e-10)
    return normalized.T.astype(np.float32)


# ---------------------------------------------------------------------------
# Plot/analysis helpers mirroring the reference's spectrogram variants
# (`labeled_example.py:99-134`); used by the plotter and tests, not the hot path.
# ---------------------------------------------------------------------------

def stft_numpy(wav: np.ndarray, n_fft: int = N_FFT, hop_length: int = HOP_LENGTH) -> np.ndarray:
    """Complex STFT ``(1 + n_fft//2, frames)`` with centered reflect padding (host path)."""
    wav = np.asarray(wav, dtype=np.float64)
    pad = n_fft // 2
    padded = np.pad(wav, pad, mode="reflect")
    n_frames = 1 + (len(padded) - n_fft) // hop_length
    strides = (padded.strides[0] * hop_length, padded.strides[0])
    frames = np.lib.stride_tricks.as_strided(padded, shape=(n_frames, n_fft), strides=strides)
    return (np.fft.rfft(frames * _hann_window(n_fft), axis=1)).T


def power_spectrogram(wav: np.ndarray, n_fft: int = N_FFT,
                      hop_length: int = HOP_LENGTH) -> np.ndarray:
    return np.abs(stft_numpy(wav, n_fft, hop_length)) ** 2


def amplitude_spectrogram(wav: np.ndarray, n_fft: int = N_FFT,
                          hop_length: int = HOP_LENGTH) -> np.ndarray:
    return np.abs(stft_numpy(wav, n_fft, hop_length))


def power_level_spectrogram(wav: np.ndarray, n_fft: int = N_FFT,
                            hop_length: int = HOP_LENGTH) -> np.ndarray:
    power = power_spectrogram(wav, n_fft, hop_length)
    with np.errstate(divide="ignore"):
        level = 10.0 * np.log10(power)
    level = np.where(power == 0.0, MIN_DECIBEL, np.maximum(level, MIN_DECIBEL))
    return level


def to_mel_scale(spectrogram: np.ndarray, sample_rate: int = SAMPLE_RATE,
                 n_fft: int = N_FFT, n_mels: int = MEL_COUNT) -> np.ndarray:
    """Apply the mel filterbank to a ``(freq, time)`` spectrogram (any type, as the reference
    does for every `SpectrogramType`)."""
    return mel_filterbank(sample_rate, n_fft, n_mels) @ spectrogram
