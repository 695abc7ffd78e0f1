"""Independent golden anchors for the feature pipeline (VERDICT round-1 'weak' #2).

The existing parity tests (test_spectrogram.py) compare the production DSP against an
in-repo numpy reimplementation — a shared misreading of the librosa conventions could
pass both. These tests anchor the contract to things that CANNOT share a bug with the
implementation:

1. closed-form signals with hand-derivable exact DFT values (impulse -> window samples;
   bin-centered cosine -> A*N/4 peak with A*N/8 side bins from the periodic-hann kernel);
2. slaney mel filterbank weights frozen as numeric literals, derived once from the scale
   definition (linear below 1 kHz at 3/200 mel/Hz; logarithmic above with ratio
   6.4^(1/27) per mel) at 30-digit precision — see the derivations in comments;
3. a cross-check of the centered reflect-padded STFT against scipy.signal.stft (an
   implementation this repo does not control).

Contract source: reference `labeled_example.py:106-115` (librosa stft n_fft=512 hop=128,
slaney mel 128, dB floor -150 before the mel matmul).
"""
import numpy as np

from speechless_tpu.features import spectrogram as sg

N_FFT, HOP, SR = 512, 128, 16000


class TestAnalyticStft:
    def test_impulse_frames_equal_window_samples(self):
        """A unit impulse at sample p: every frame containing it has |X[k]|^2 equal to
        the squared hann window sample at the impulse's in-frame offset, for EVERY bin k
        (the DFT of a shifted delta has flat magnitude)."""
        wav = np.zeros(4096, np.float32)
        p = 1000
        wav[p] = 1.0
        power = sg.power_spectrogram(wav)  # (freq, frames), centered: pad = 256
        padded_position = p + N_FFT // 2
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT)
        for t in range(power.shape[1]):
            offset = padded_position - t * HOP
            if 0 <= offset < N_FFT and t * HOP >= N_FFT // 4:  # frames holding the impulse
                np.testing.assert_allclose(power[:, t], window[offset] ** 2,
                                           rtol=1e-5, atol=1e-10)
            elif 6 <= t <= 20 and not 0 <= offset < N_FFT:
                np.testing.assert_allclose(power[:, t], 0.0, atol=1e-12)

    def test_bin_centered_cosine_peak_and_sidebins(self):
        """cos at f = k0*sr/N with amplitude A: every interior frame holds an integer
        number of periods, so |X[k0]| = A*N/4 and |X[k0+-1]| = A*N/8 exactly (periodic
        hann kernel: W(0)=N/2, W(+-1)=-N/4, zero elsewhere), all other bins zero."""
        k0, amplitude = 80, 0.5
        f = k0 * SR / N_FFT  # 2500 Hz, exactly bin-centered
        n = np.arange(4096)
        wav = (amplitude * np.cos(2 * np.pi * f * n / SR)).astype(np.float64)
        power = sg.power_spectrogram(wav)
        peak = (amplitude * N_FFT / 4) ** 2          # 64^2 = 4096
        side = (amplitude * N_FFT / 8) ** 2          # 32^2 = 1024
        interior = range(2, (len(wav) - N_FFT // 2) // HOP)  # no reflected samples
        for t in interior:
            np.testing.assert_allclose(power[k0, t], peak, rtol=1e-6)
            np.testing.assert_allclose(power[k0 - 1, t], side, rtol=1e-6)
            np.testing.assert_allclose(power[k0 + 1, t], side, rtol=1e-6)
            others = np.delete(power[:, t], [k0 - 1, k0, k0 + 1])
            np.testing.assert_allclose(others, 0.0, atol=1e-6)


class TestSlaneyConstants:
    """Filterbank weights frozen as literals, derived by hand from the slaney scale at
    30-digit precision (mpmath, outside this repo's code paths):

      mel(8000 Hz) = 15 + 27*ln(8)/ln(6.4)            = 45.24564047192497
      spacing      = mel(8000)/129                     = 0.350741399007170
      filter 0:   0 / 23.38275993381135 / 46.76551986762271 Hz   (linear region)
      filter 64:  1668.667481882119 / 1709.394967074742 / 1751.116495759030 Hz
      filter 127: 7623.330536481877 / 7809.394617501091 / 8000 Hz (log region)

    Weight = triangle((f-l)/(c-l) rising, (u-f)/(u-c) falling) * 2/(u-l), FFT bins at
    k*31.25 Hz."""

    def test_linear_region_weight(self):
        weights = sg.mel_filterbank()
        # bin 1 (31.25 Hz) on filter 0's falling slope:
        # (46.76551986762271-31.25)/(46.76551986762271-23.38275993381135)
        #   * 2/46.76551986762271 = 0.02837754297411921
        np.testing.assert_allclose(weights[0, 1], 0.02837754297411921, rtol=1e-9)

    def test_mid_filter_weight(self):
        weights = sg.mel_filterbank()
        # bin 54 (1687.5 Hz) on filter 64's rising slope:
        # (1687.5-1668.667481882119)/(1709.394967074742-1668.667481882119)
        #   * 2/(1751.116495759030-1668.667481882119) = 0.011216705810952104
        np.testing.assert_allclose(weights[64, 54], 0.011216705810952104, rtol=1e-9)

    def test_log_region_weight(self):
        weights = sg.mel_filterbank()
        # bin 244 (7625 Hz) on filter 127's rising slope:
        # (7625-7623.330536481877)/(7809.394617501091-7623.330536481877)
        #   * 2/(8000-7623.330536481877) = 4.764134051098769e-05
        np.testing.assert_allclose(weights[127, 244], 4.764134051098769e-05, rtol=1e-8)

    def test_scale_anchors(self):
        # 1 kHz is exactly 15 mel; the linear slope is 200/3 Hz per mel.
        np.testing.assert_allclose(sg.hz_to_mel_slaney(np.array([1000.0])), [15.0])
        np.testing.assert_allclose(sg.mel_to_hz_slaney(np.array([3.0])), [200.0])
        # One octave above 1 kHz: 2000 Hz = 15 + 27*ln(2)/ln(6.4) mel = 25.081880157308323
        np.testing.assert_allclose(sg.hz_to_mel_slaney(np.array([2000.0])),
                                   [25.081880157308323], rtol=1e-12)


class TestScipyCrossCheck:
    def test_stft_matches_scipy(self):
        """scipy.signal.stft with even-extension boundary implements the same centered
        reflect-padded hann STFT (scipy scales by 1/sum(window) = 1/256)."""
        from scipy import signal

        rand = np.random.RandomState(3)
        wav = rand.randn(SR).astype(np.float64)  # 1 s noise, not hop-aligned: 16000/128=125
        ours = sg.stft_numpy(wav)  # complex (freq, frames)
        _, _, scipy_stft = signal.stft(wav, fs=SR, window="hann", nperseg=N_FFT,
                                       noverlap=N_FFT - HOP, boundary="even",
                                       padded=True, detrend=False)
        frames = min(ours.shape[1], scipy_stft.shape[1])
        np.testing.assert_allclose(np.abs(ours[:, :frames]),
                                   np.abs(scipy_stft[:, :frames]) * (N_FFT / 2),
                                   rtol=1e-7, atol=1e-9)

    def test_batched_jax_path_matches_numpy_on_tonal_signal(self):
        """The device path matches the host path on a structured (tonal) signal, not just
        the noise signal of test_spectrogram.py. A noise floor is added deliberately: on a
        PURE tone the exact host path floors leakage bins at -150 dB while the f32 DFT-conv
        leaves ~1e-6 leakage (~-120 dB) — an inherent dB-domain dynamic-range artifact, not
        a parity bug; real audio always carries a noise floor."""
        import jax.numpy as jnp

        k0, amplitude = 40, 0.25
        n = np.arange(4096)
        wav = (amplitude * np.cos(2 * np.pi * k0 * (SR / N_FFT) * n / SR)
               + 0.005 * np.random.RandomState(0).randn(len(n))).astype(np.float32)
        host = sg.z_normalized_transposed_spectrogram(wav)
        device, counts = sg.features_batch(jnp.asarray(wav[None, :]),
                                           jnp.asarray([len(wav)], jnp.int32))
        frames = int(np.asarray(counts)[0])
        assert frames == host.shape[0]
        np.testing.assert_allclose(np.asarray(device)[0, :frames], host,
                                   rtol=2e-3, atol=2e-3)
