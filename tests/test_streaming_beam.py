"""Incremental streaming beam (ops/decode_incremental.py).

Contract: feeding any chunking of a posterior sequence through `BeamStreamDecoder`
yields EXACTLY the offline `beam_search_decode_jax` result on the concatenated
sequence — for every fusion mode (none / char table / word LM / lexicon-constrained)
and with per-frame class pruning. The offline decoder is itself parity-pinned against
the host reference beam, so this transitively pins the streaming beam to the
reference's TF/KenLM-fork semantics (`net.py:438-454`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from speechless_tpu.lm.arpa_builder import build_kenlm_directory
from speechless_tpu.lm.char_ngram import char_ngram_table_from_texts
from speechless_tpu.lm.device_lm import build_device_word_lm
from speechless_tpu.lm.ngram import ArpaLanguageModel
from speechless_tpu.ops.decode_incremental import BeamStreamDecoder
from speechless_tpu.ops.decode_jax import beam_search_decode_jax, beam_search_nbest_jax

ALPHABET = list("abcdefghijklmnopqrstuvwxyz '")
BLANK = len(ALPHABET)

TEXTS = ["the cat sat on the mat",
         "the cat ran to the dog",
         "a dog sat on a log",
         "the dog ran to the cat"]


def random_log_probs(t, classes, seed, peaky=2.5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, classes) * peaky
    logits = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)),
                                    -1, keepdims=True)) - logits.max(-1, keepdims=True)
    return logits.astype(np.float32)


def offline(lp, **kwargs):
    tokens, counts = beam_search_decode_jax(jnp.asarray(lp[None]),
                                            jnp.asarray([lp.shape[0]]), **kwargs)
    return np.asarray(tokens)[0][: int(counts[0])]


def stream(lp, splits, **kwargs):
    decoder = BeamStreamDecoder(**kwargs)
    state = decoder.init_state()
    result = None
    start = 0
    for end in list(splits) + [lp.shape[0]]:
        state, result = decoder.feed(state, lp[start:end])
        start = end
    return decoder, result


CHUNKINGS = [[], [1], [7, 8, 9], list(range(1, 40))]  # one-shot, odd splits, per-frame


class TestNoLmParity:
    @pytest.mark.parametrize("splits", CHUNKINGS)
    def test_matches_offline(self, splits):
        lp = random_log_probs(40, 6, seed=0)
        expected = offline(lp, blank=5, beam_width=8, max_decoded_length=32)
        _, result = stream(lp, splits, blank=5, beam_width=8, max_decoded_length=32,
                           chunk_frames=16)
        np.testing.assert_array_equal(result.tokens, expected)

    def test_chunk_capacity_slicing(self):
        # A feed far larger than chunk_frames is sliced + padded internally.
        lp = random_log_probs(57, 5, seed=1)
        expected = offline(lp, blank=4, beam_width=6, max_decoded_length=64)
        _, result = stream(lp, [], blank=4, beam_width=6, max_decoded_length=64,
                           chunk_frames=8)
        np.testing.assert_array_equal(result.tokens, expected)

    def test_score_matches_nbest_top1(self):
        lp = random_log_probs(30, 6, seed=2)
        _, _, scores = beam_search_nbest_jax(jnp.asarray(lp[None]),
                                             jnp.asarray([30]), blank=5, nbest=1,
                                             beam_width=8, max_decoded_length=32)
        _, result = stream(lp, [10, 20], blank=5, beam_width=8,
                           max_decoded_length=32, chunk_frames=16)
        assert result.score == pytest.approx(float(scores[0, 0]), rel=1e-5)

    def test_empty_feed_keeps_best(self):
        lp = random_log_probs(20, 6, seed=3)
        decoder, result = stream(lp, [], blank=5, beam_width=8,
                                 max_decoded_length=32, chunk_frames=32)
        state = decoder.init_state()
        state, _ = decoder.feed(state, lp)
        state, again = decoder.feed(state, lp[:0])
        np.testing.assert_array_equal(again.tokens, result.tokens)
        assert again.score == pytest.approx(result.score)

    def test_prune_classes(self):
        # max_decoded_length is generous: the exactness contract holds while the
        # transcript stays clear of capacity rollover (40 frames emit ~32 chars,
        # which would trigger rollover — and offline capacity truncation — at 32).
        lp = random_log_probs(40, 12, seed=4, peaky=4.0)
        kwargs = dict(blank=11, beam_width=8, max_decoded_length=64, prune_classes=4)
        expected = offline(lp, **kwargs)
        _, result = stream(lp, [13, 26], chunk_frames=16, **kwargs)
        np.testing.assert_array_equal(result.tokens, expected)

    def test_rollover_beyond_capacity(self):
        # A stream that outgrows max_decoded_length must keep emitting: the decoder
        # commits the best prefix and restarts the beam (rollover) instead of
        # freezing at the buffer capacity. With deterministic alternating peaks the
        # transcript equals the offline decode at a capacity large enough to hold it.
        t, classes, cap = 30, 4, 8
        lp = np.full((t, classes), -20.0, np.float32)
        lp[np.arange(t), np.arange(t) % 2] = -0.01
        expected = offline(lp, blank=3, beam_width=4, max_decoded_length=64)
        assert len(expected) == t  # every frame emits — the stream MUST exceed cap
        _, result = stream(lp, [11], blank=3, beam_width=4, max_decoded_length=cap,
                           chunk_frames=4)
        assert len(result.tokens) == t > cap
        np.testing.assert_array_equal(result.tokens, expected)

    def test_rollover_committed_prefix_is_stable(self):
        # Tokens committed by a rollover never change on later feeds.
        t, classes, cap = 24, 4, 6
        lp = np.full((t, classes), -20.0, np.float32)
        lp[np.arange(t), np.arange(t) % 2] = -0.01
        decoder = BeamStreamDecoder(blank=3, beam_width=4, max_decoded_length=cap,
                                    chunk_frames=3)
        state = decoder.init_state()
        state, mid = decoder.feed(state, lp[:12])
        committed_len = len(state.committed)
        assert committed_len > 0
        state, end = decoder.feed(state, lp[12:])
        np.testing.assert_array_equal(end.tokens[:committed_len],
                                      mid.tokens[:committed_len])

    def test_rejects_chunk_frames_beyond_capacity(self):
        with pytest.raises(ValueError, match="chunk_frames"):
            BeamStreamDecoder(blank=3, beam_width=4, max_decoded_length=8,
                              chunk_frames=16)


class TestCharLmParity:
    @pytest.mark.parametrize("splits", [[], [5, 17]])
    def test_matches_offline(self, splits):
        table = jnp.asarray(char_ngram_table_from_texts(
            ["abab", "ba", "aabb"], ["a", "b"], order=3))
        lp = random_log_probs(24, 3, seed=5, peaky=1.5)
        kwargs = dict(blank=2, beam_width=6, max_decoded_length=32,
                      lm_table=table, lm_weight=0.7)
        expected = offline(lp, **kwargs)
        _, result = stream(lp, splits, chunk_frames=8, **kwargs)
        np.testing.assert_array_equal(result.tokens, expected)


@pytest.fixture(scope="module")
def word_lm(tmp_path_factory):
    directory = tmp_path_factory.mktemp("lm")
    build_kenlm_directory(TEXTS, directory, allowed_characters=ALPHABET, order=3)
    arpa = ArpaLanguageModel.load(directory / "lm.arpa")
    return build_device_word_lm(arpa, ALPHABET)


class TestWordLmParity:
    @pytest.mark.parametrize("lexicon", [False, True])
    @pytest.mark.parametrize("splits", [[], [9, 31]])
    def test_matches_offline(self, word_lm, splits, lexicon):
        lp = random_log_probs(48, len(ALPHABET) + 1, seed=6, peaky=3.0)
        kwargs = dict(blank=BLANK, beam_width=8, max_decoded_length=64,
                      word_lm=word_lm, lm_weight=0.8, word_count_weight=0.0,
                      valid_word_count_weight=2.3, lexicon_constrained=lexicon)
        expected = offline(lp, **kwargs)
        _, result = stream(lp, splits, chunk_frames=16, **kwargs)
        np.testing.assert_array_equal(result.tokens, expected)


class TestFeedBatch:
    """`feed_batch` is EXACTLY sequential `feed` per stream, in fewer dispatches."""

    def _sequential(self, decoder, states, rows):
        return [decoder.feed(s, lp) for s, lp in zip(states, rows)]

    def test_mixed_lengths_match_sequential(self):
        decoder = BeamStreamDecoder(blank=5, beam_width=8, max_decoded_length=32,
                                    chunk_frames=8)
        rows = [random_log_probs(t, 6, seed=10 + i)
                for i, t in enumerate([40, 7, 0, 23])]
        seq = self._sequential(decoder, [decoder.init_state()] * len(rows), rows)
        batch = decoder.feed_batch([decoder.init_state()] * len(rows), rows)
        for (_, want), (_, got) in zip(seq, batch):
            np.testing.assert_array_equal(got.tokens, want.tokens)
            assert got.score == pytest.approx(want.score)

    def test_multi_feed_states_stay_equal(self):
        # Two rounds of feeds: the STATES carried out of feed_batch keep later
        # results identical to sequential feeding.
        decoder = BeamStreamDecoder(blank=5, beam_width=8, max_decoded_length=32,
                                    chunk_frames=8)
        first = [random_log_probs(t, 6, seed=20 + i)
                 for i, t in enumerate([17, 9, 30])]
        second = [random_log_probs(t, 6, seed=30 + i)
                  for i, t in enumerate([5, 22, 11])]
        seq_states = [decoder.init_state()] * 3
        seq1 = self._sequential(decoder, seq_states, first)
        seq2 = self._sequential(decoder, [s for s, _ in seq1], second)
        batch1 = decoder.feed_batch([decoder.init_state()] * 3, first)
        batch2 = decoder.feed_batch([s for s, _ in batch1], second)
        for (_, want), (_, got) in zip(seq2, batch2):
            np.testing.assert_array_equal(got.tokens, want.tokens)
            assert got.score == pytest.approx(want.score)

    def test_rollover_rows_match_sequential(self):
        # One row outgrows max_decoded_length mid-batch (per-row rollover), the
        # other stays small — both must equal their sequential feeds.
        t, classes, cap = 30, 4, 8
        dense = np.full((t, classes), -20.0, np.float32)
        dense[np.arange(t), np.arange(t) % 2] = -0.01
        small = random_log_probs(6, classes, seed=40)
        decoder = BeamStreamDecoder(blank=3, beam_width=4, max_decoded_length=cap,
                                    chunk_frames=4)
        rows = [dense, small]
        seq = self._sequential(decoder, [decoder.init_state()] * 2, rows)
        batch = decoder.feed_batch([decoder.init_state()] * 2, rows)
        for (_, want), (_, got) in zip(seq, batch):
            np.testing.assert_array_equal(got.tokens, want.tokens)
            assert got.score == pytest.approx(want.score)
        assert len(batch[0][1].tokens) == t > cap  # the rollover actually fired

    def test_word_lm_batch_matches_sequential(self, word_lm):
        decoder = BeamStreamDecoder(blank=BLANK, beam_width=8, max_decoded_length=64,
                                    word_lm=word_lm, lm_weight=0.8,
                                    valid_word_count_weight=2.3, chunk_frames=16)
        rows = [random_log_probs(t, len(ALPHABET) + 1, seed=50 + i, peaky=3.0)
                for i, t in enumerate([48, 20])]
        seq = self._sequential(decoder, [decoder.init_state()] * 2, rows)
        batch = decoder.feed_batch([decoder.init_state()] * 2, rows)
        for (_, want), (_, got) in zip(seq, batch):
            np.testing.assert_array_equal(got.tokens, want.tokens)
            assert got.score == pytest.approx(want.score)

    def test_empty_and_singleton(self):
        decoder = BeamStreamDecoder(blank=2, beam_width=4)
        assert decoder.feed_batch([], []) == []
        lp = random_log_probs(10, 3, seed=60)
        (_, single), = decoder.feed_batch([decoder.init_state()], [lp])
        _, want = decoder.feed(decoder.init_state(), lp)
        np.testing.assert_array_equal(single.tokens, want.tokens)

    def test_rejects_mismatched_inputs(self):
        decoder = BeamStreamDecoder(blank=2, beam_width=4)
        with pytest.raises(ValueError):
            decoder.feed_batch([decoder.init_state()], [])
        with pytest.raises(ValueError, match="class count"):
            decoder.feed_batch([decoder.init_state()] * 2,
                               [random_log_probs(4, 3, seed=0),
                                random_log_probs(4, 4, seed=0)])


class TestValidation:
    def test_rejects_both_lms(self, word_lm):
        with pytest.raises(ValueError):
            BeamStreamDecoder(blank=BLANK, lm_table=jnp.zeros((3, 2)), word_lm=word_lm)

    def test_rejects_lexicon_without_word_lm(self):
        with pytest.raises(ValueError):
            BeamStreamDecoder(blank=BLANK, lexicon_constrained=True)

    def test_rejects_bad_feed_shape(self):
        decoder = BeamStreamDecoder(blank=2, beam_width=4)
        with pytest.raises(ValueError):
            decoder.feed(decoder.init_state(), np.zeros((3,), np.float32))
