"""N-best beam decoding (`ops/decode_jax.py::beam_search_nbest_jax`,
`serving.Transcriber.transcribe_nbest`): the reference's TF decoder exposed
``top_paths``; here the same search returns its top-n final beams with scores."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.ops.decode_jax import beam_search_decode_jax, beam_search_nbest_jax
from speechless_tpu.serving import Transcriber

ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")


def random_log_probs(batch, t_max, classes, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(batch, t_max, classes).astype(np.float32) * 2.0
    return jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


class TestBeamSearchNbest:
    def test_top1_matches_single_best_search(self):
        log_probs = random_log_probs(3, 12, 5)
        lengths = jnp.asarray([12, 7, 1], jnp.int32)
        best_tokens, best_counts = beam_search_decode_jax(
            log_probs, lengths, blank=4, beam_width=8)
        nbest_tokens, nbest_counts, scores = beam_search_nbest_jax(
            log_probs, lengths, blank=4, nbest=4, beam_width=8)
        np.testing.assert_array_equal(np.asarray(nbest_tokens[:, 0]),
                                      np.asarray(best_tokens))
        np.testing.assert_array_equal(np.asarray(nbest_counts[:, 0]),
                                      np.asarray(best_counts))

    def test_scores_descend_and_hypotheses_are_distinct(self):
        log_probs = random_log_probs(2, 10, 5, seed=3)
        lengths = jnp.asarray([10, 10], jnp.int32)
        tokens, counts, scores = beam_search_nbest_jax(
            log_probs, lengths, blank=4, nbest=5, beam_width=8)
        tokens, counts, scores = (np.asarray(tokens), np.asarray(counts),
                                  np.asarray(scores))
        for b in range(2):
            alive = scores[b] > -1e29
            assert np.all(np.diff(scores[b][alive]) <= 1e-6)
            decoded = [tuple(tokens[b, i, :counts[b, i]]) for i in range(5) if alive[i]]
            assert len(decoded) == len(set(decoded)), "duplicate hypothesis"

    def test_dead_beams_come_back_empty(self):
        # One frame over 3 classes (incl. blank) admits at most 3 distinct prefixes
        # ("", "a", "b"); asking for 6 must mask the tail, not emit garbage.
        log_probs = random_log_probs(1, 1, 3, seed=1)
        lengths = jnp.asarray([1], jnp.int32)
        tokens, counts, scores = beam_search_nbest_jax(
            log_probs, lengths, blank=2, nbest=6, beam_width=8)
        tokens, counts, scores = (np.asarray(tokens)[0], np.asarray(counts)[0],
                                  np.asarray(scores)[0])
        alive = scores > -1e29
        assert alive.sum() == 3
        assert np.all(counts[~alive] == 0)
        assert np.all(tokens[~alive] == -1)

    def test_nbest_must_fit_the_beam(self):
        log_probs = random_log_probs(1, 4, 4)
        lengths = jnp.asarray([4], jnp.int32)
        with pytest.raises(ValueError, match="nbest"):
            beam_search_nbest_jax(log_probs, lengths, blank=3, nbest=9, beam_width=8)
        with pytest.raises(ValueError, match="nbest"):
            beam_search_nbest_jax(log_probs, lengths, blank=3, nbest=0, beam_width=8)


class TestTranscriberNbest:
    @pytest.fixture(scope="class")
    def transcriber(self):
        config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                      grapheme_set_size=len(ALPHABET) + 1)
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        return Transcriber(config, params, ALPHABET, sample_buckets=(8192,))

    def test_top_hypothesis_matches_transcribe_audio(self, transcriber):
        rng = np.random.RandomState(0)
        audio = rng.randn(6000).astype(np.float32) * 0.1
        hypotheses = transcriber.transcribe_nbest(audio, nbest=3)
        assert 1 <= len(hypotheses) <= 3
        texts = [text for text, _ in hypotheses]
        assert len(set(texts)) == len(texts)
        scores = [score for _, score in hypotheses]
        assert scores == sorted(scores, reverse=True)
        # The untrained beam's 1-best may differ from greedy; pin the n-best list's own
        # internal consistency instead: re-asking with nbest=1 returns the same winner.
        assert transcriber.transcribe_nbest(audio, nbest=1)[0][0] == texts[0]

    def test_program_cache_reuses_per_n(self, transcriber):
        rng = np.random.RandomState(1)
        audio = rng.randn(5000).astype(np.float32) * 0.1
        transcriber.transcribe_nbest(audio, nbest=2)
        transcriber.transcribe_nbest(audio, nbest=2)
        assert set(transcriber._nbest_programs) >= {2}
