"""Batched offline transcription (`serving.Transcriber.transcribe_batch`):
parity with the single-utterance path, input-order preservation, bucket grouping."""
import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.serving import Transcriber

ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")


@pytest.fixture(scope="module")
def transcriber():
    import jax
    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    params = w2l.init_params(config, jax.random.PRNGKey(0))
    return Transcriber(config, params, ALPHABET, sample_buckets=(16384, 32768))


def test_batch_matches_single_and_preserves_order(transcriber):
    rng = np.random.RandomState(0)
    # Mixed lengths spanning both buckets, deliberately unsorted.
    audios = [(rng.randn(n) * 0.1).astype(np.float32)
              for n in (20000, 9000, 16384, 30000, 4000)]
    batched = transcriber.transcribe_batch(audios, batch_size=2)
    assert len(batched) == len(audios)
    for audio, (text, confidence) in zip(audios, batched):
        single_text, single_confidence = \
            transcriber.transcribe_audio_with_confidence(audio)
        assert text == single_text
        assert confidence == pytest.approx(single_confidence, abs=1e-5)


def test_partial_final_group_pads_to_batch_size(transcriber):
    rng = np.random.RandomState(1)
    audios = [(rng.randn(9000) * 0.1).astype(np.float32) for _ in range(3)]
    results = transcriber.transcribe_batch(audios, batch_size=8)  # one padded dispatch
    assert len(results) == 3
    assert all(isinstance(t, str) and 0 < c <= 1 for t, c in results)


def test_empty_batch(transcriber):
    assert transcriber.transcribe_batch([]) == []


def test_dp_sharded_batch_matches_unsharded():
    """DP-sharded serving (`Transcriber(mesh=...)`): batched programs shard their
    batch axis P('data') over the mesh; transcripts must match the single-device
    transcriber on the same params, and indivisible batch sizes fail loudly."""
    import jax

    from speechless_tpu.parallel import mesh as pmesh

    config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                  grapheme_set_size=len(ALPHABET) + 1)
    params = w2l.init_params(config, jax.random.PRNGKey(2))
    plain = Transcriber(config, params, ALPHABET, sample_buckets=(16384,))
    mesh = pmesh.make_mesh(jax.devices()[:8])
    sharded = Transcriber(config, params, ALPHABET, sample_buckets=(16384,),
                          mesh=mesh)
    rng = np.random.RandomState(8)
    audios = [(0.3 * rng.randn(rng.randint(4000, 16000))).astype(np.float32)
              for _ in range(10)]
    assert sharded.transcribe_batch(audios, batch_size=8) == \
        plain.transcribe_batch(audios, batch_size=8)
    frames = sharded.frame_tokens_batch(audios[:8], batch_size=8)
    expected = plain.frame_tokens_batch(audios[:8], batch_size=8)
    for got, want in zip(frames, expected):
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="does not divide"):
        sharded.transcribe_batch(audios[:3], batch_size=3)
