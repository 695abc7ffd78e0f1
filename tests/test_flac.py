"""Native FLAC decoder round-trip tests against the minimal test-vector encoder."""
import numpy as np
import pytest

from speechless_tpu.features import audio_io
from speechless_tpu.native import _native

from speechless_tpu.features.flac_encoder import encode_flac

pytestmark = pytest.mark.skipif(_native is None, reason="native extension unavailable")


def int16_wave(n, seed=0, amplitude=8000):
    rand = np.random.RandomState(seed)
    t = np.arange(n)
    wave = (amplitude * np.sin(2 * np.pi * 440 * t / 16000)
            + 200 * rand.randn(n)).astype(np.int64)
    return np.clip(wave, -32768, 32767).astype(np.int64).tolist()


class TestFlacDecode:
    @pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed0", "fixed1", "fixed2"])
    def test_mono_roundtrip(self, tmp_path, mode):
        n = 10000
        if mode == "constant":
            samples = [1234] * n
        else:
            samples = int16_wave(n)
        path = tmp_path / "test.flac"
        encode_flac(str(path), [samples], subframe_mode=mode)
        audio, rate = _native.decode_flac(str(path))
        assert rate == 16000
        assert len(audio) == n
        expected = np.array(samples, dtype=np.float32) / 32768.0
        np.testing.assert_allclose(audio, expected, atol=1e-6)

    def test_stereo_mean_downmix(self, tmp_path):
        n = 5000
        left = int16_wave(n, seed=1)
        right = int16_wave(n, seed=2)
        path = tmp_path / "stereo.flac"
        encode_flac(str(path), [left, right], subframe_mode="fixed1")
        audio, rate = _native.decode_flac(str(path))
        expected = (np.array(left, np.float32) + np.array(right, np.float32)) / 2 / 32768.0
        np.testing.assert_allclose(audio, expected, atol=1e-6)

    def test_multiframe(self, tmp_path):
        samples = int16_wave(10000)
        path = tmp_path / "frames.flac"
        encode_flac(str(path), [samples], block_size=1024, subframe_mode="fixed2")
        audio, _ = _native.decode_flac(str(path))
        np.testing.assert_allclose(audio, np.array(samples, np.float32) / 32768.0, atol=1e-6)

    def test_audio_io_integration(self, tmp_path):
        samples = int16_wave(16000)
        path = tmp_path / "utt.flac"
        encode_flac(str(path), [samples])
        loaded = audio_io.load_audio(path, sample_rate=16000)
        np.testing.assert_allclose(loaded, np.array(samples, np.float32) / 32768.0, atol=1e-6)
        assert audio_io.file_sample_rate(path) == 16000
        assert audio_io.probe_duration_in_s(path) == pytest.approx(1.0)

    def test_resampled_load(self, tmp_path):
        samples = int16_wave(16000)
        path = tmp_path / "rs.flac"
        encode_flac(str(path), [samples], sample_rate=16000)
        loaded = audio_io.load_audio(path, sample_rate=8000)
        assert len(loaded) == 8000

    def test_corrupt_file_raises(self, tmp_path):
        path = tmp_path / "bad.flac"
        path.write_bytes(b"fLaC" + b"\x00" * 100)
        with pytest.raises(ValueError):
            _native.decode_flac(str(path))


class TestCorruptHeaders:
    def test_huge_claimed_total_samples_returns_error(self, tmp_path):
        """A corrupt STREAMINFO claiming ~2^36 samples must raise, not abort the process."""
        samples = int16_wave(1000)
        path = tmp_path / "huge.flac"
        encode_flac(str(path), [samples])
        data = bytearray(path.read_bytes())
        # STREAMINFO bytes 18..26 hold rate(20)|channels(3)|bps(5)|total(36);
        # set the 36-bit total-samples field to all ones, keep rate/channels/bps.
        bits = int.from_bytes(data[18:26], "big")
        bits |= (1 << 36) - 1
        data[18:26] = bits.to_bytes(8, "big")
        path.write_bytes(bytes(data))
        from speechless_tpu.native import _native
        try:
            audio, rate = _native.decode_flac(str(path))
            assert rate == 16000  # decodes fine if implementation tolerates the lie
        except ValueError:
            pass  # error return is also acceptable; process death is not

    def test_truncated_flac_header_raises_valueerror(self, tmp_path):
        path = tmp_path / "trunc.flac"
        path.write_bytes(b"fLaC\x00\x00")
        import pytest as _pytest
        from speechless_tpu.features import audio_io
        with _pytest.raises(ValueError):
            audio_io.file_sample_rate(path)
        assert audio_io.probe_duration_in_s(path) == 0.0
