"""Pallas incremental streaming beam (ops/decode_incremental_pallas.py).

Contract: `PallasBeamStreamDecoder` fed any chunking equals the OFFLINE Pallas
hybrid beam (`decode_pallas_lm.py`) on the concatenated frames — the same
chunked-equals-offline guarantee `test_streaming_beam.py` pins for the XLA
decoder — and matches the XLA streaming decoder token-for-token at equal
``prune_classes`` (the offline kernels' pinned cross-engine parity, streamed).
On CPU the kernel runs in interpret mode, so shapes here stay tiny and each
decoder configuration is shared across tests (one compile per program shape).
"""
import types

import numpy as np
import jax.numpy as jnp
import pytest

from speechless_tpu.lm.arpa_builder import build_kenlm_directory
from speechless_tpu.lm.device_lm import build_device_word_lm
from speechless_tpu.lm.ngram import ArpaLanguageModel
from speechless_tpu.ops.decode_incremental import BeamStreamDecoder
from speechless_tpu.ops.decode_incremental_pallas import PallasBeamStreamDecoder
from speechless_tpu.ops.decode_pallas_lm import (
    beam_search_decode_pallas_frames, beam_search_decode_pallas_lm)

ALPHABET = list("abcdefghijklmnopqrstuvwxyz '")
BLANK_LM = len(ALPHABET)
TEXTS = ["the cat sat on the mat",
         "the cat ran to the dog",
         "a dog sat on a log",
         "the dog ran to the cat"]

C, BLANK, W = 6, 5, 8  # tiny no-LM alphabet: interpret-mode compiles are the cost


def random_log_probs(t, classes, seed, peaky=2.5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, classes) * peaky
    logits = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)),
                                    -1, keepdims=True)) - logits.max(-1, keepdims=True)
    return logits.astype(np.float32)


def stream(decoder, lp, splits):
    state = decoder.init_state()
    result = None
    start = 0
    for end in list(splits) + [lp.shape[0]]:
        state, result = decoder.feed(state, lp[start:end])
        start = end
    return state, result


@pytest.fixture(scope="module")
def no_lm_decoder():
    return PallasBeamStreamDecoder(blank=BLANK, beam_width=W,
                                   max_decoded_length=64, chunk_frames=16,
                                   prune_classes=C)


@pytest.fixture(scope="module")
def word_lm(tmp_path_factory):
    directory = tmp_path_factory.mktemp("lm")
    build_kenlm_directory(TEXTS, directory, allowed_characters=ALPHABET, order=3)
    arpa = ArpaLanguageModel.load(directory / "lm.arpa")
    return build_device_word_lm(arpa, ALPHABET)


class TestNoLmParity:
    @pytest.mark.parametrize("splits", [[], [7, 8, 9]])
    def test_matches_offline_pallas(self, no_lm_decoder, splits):
        lp = random_log_probs(40, C, seed=0)
        tokens, counts = beam_search_decode_pallas_frames(
            jnp.asarray(lp[None]), jnp.asarray([lp.shape[0]]), blank=BLANK,
            beam_width=W, max_decoded_length=64, prune_classes=C)
        offline = np.asarray(tokens)[0][: int(counts[0])]
        _, result = stream(no_lm_decoder, lp, splits)
        assert np.array_equal(result.tokens, offline)

    def test_matches_xla_streaming(self, no_lm_decoder):
        lp = random_log_probs(40, C, seed=1)
        xla = BeamStreamDecoder(blank=BLANK, beam_width=W, max_decoded_length=64,
                                chunk_frames=16, prune_classes=C)
        _, expected = stream(xla, lp, [11])
        _, result = stream(no_lm_decoder, lp, [11])
        assert np.array_equal(result.tokens, expected.tokens)

    def test_empty_feed_keeps_best(self, no_lm_decoder):
        lp = random_log_probs(24, C, seed=2)
        state, result = stream(no_lm_decoder, lp, [])
        _, again = no_lm_decoder.feed(state, np.zeros((0, C), np.float32))
        assert np.array_equal(again.tokens, result.tokens)

    def test_feed_batch_matches_sequential(self, no_lm_decoder):
        lps = [random_log_probs(30 + 7 * i, C, seed=10 + i) for i in range(2)]
        lps.append(np.zeros((0, C), np.float32))    # zero-length row = exact no-op
        sequential = [no_lm_decoder.feed(no_lm_decoder.init_state(), lp)[1]
                      for lp in lps]
        batched = no_lm_decoder.feed_batch(
            [no_lm_decoder.init_state() for _ in lps], lps)
        for (_, result), expected in zip(batched, sequential):
            assert np.array_equal(result.tokens, expected.tokens)
            assert abs(result.score - expected.score) < 1e-4

    def test_rollover_matches_xla(self):
        lp = random_log_probs(120, C, seed=7)
        pallas = PallasBeamStreamDecoder(blank=BLANK, beam_width=W,
                                         max_decoded_length=24, chunk_frames=8,
                                         prune_classes=C)
        xla = BeamStreamDecoder(blank=BLANK, beam_width=W, max_decoded_length=24,
                                chunk_frames=8, prune_classes=C)
        state_p, result_p = stream(pallas, lp, [])
        state_x, result_x = stream(xla, lp, [])
        assert np.array_equal(result_p.tokens, result_x.tokens)
        assert np.array_equal(state_p.committed, state_x.committed)


class TestWordLmParity:
    @pytest.mark.parametrize("splits", [[], [5, 13, 30]])
    def test_matches_offline_pallas(self, word_lm, splits):
        lp = random_log_probs(48, BLANK_LM + 1, seed=3)
        tokens, counts = beam_search_decode_pallas_lm(
            jnp.asarray(lp[None]), jnp.asarray([lp.shape[0]]), blank=BLANK_LM,
            word_lm=word_lm, beam_width=W, max_decoded_length=64, prune_classes=8)
        offline = np.asarray(tokens)[0][: int(counts[0])]
        decoder = PallasBeamStreamDecoder(blank=BLANK_LM, beam_width=W,
                                          max_decoded_length=64, chunk_frames=16,
                                          word_lm=word_lm, prune_classes=8)
        _, result = stream(decoder, lp, splits)
        assert np.array_equal(result.tokens, offline)


class TestConstruction:
    def test_rejects_char_table(self):
        with pytest.raises(ValueError, match="XLA-only"):
            PallasBeamStreamDecoder(blank=BLANK, lm_table=jnp.zeros((3, 2)))

    def test_rejects_lexicon_constraint(self):
        with pytest.raises(ValueError, match="XLA-only"):
            PallasBeamStreamDecoder(blank=BLANK, lexicon_constrained=True)

    def test_prune_none_defaults_to_eight(self):
        decoder = PallasBeamStreamDecoder(blank=BLANK, prune_classes=None)
        assert decoder.prune_classes == 8

    def test_rejects_oversized_alphabet(self):
        decoder = PallasBeamStreamDecoder(blank=99, beam_width=W,
                                          prune_classes=32)
        with pytest.raises(ValueError, match="packed frame row"):
            decoder.feed(decoder.init_state(), np.zeros((4, 100), np.float32))


class TestRouting:
    @staticmethod
    def fake_transcriber(**overrides):
        base = dict(blank_index=BLANK, _decoder={"beam_width": W,
                                                 "prune_classes": C},
                    word_lm=None, lexicon_constrained=False)
        base.update(overrides)
        return types.SimpleNamespace(**base)

    def test_engine_pallas(self):
        from speechless_tpu.serving_streaming import beam_decoder_for

        decoder = beam_decoder_for(self.fake_transcriber(), engine="pallas")
        assert isinstance(decoder, PallasBeamStreamDecoder)

    def test_auto_is_xla_off_tpu(self):
        import jax

        from speechless_tpu.serving_streaming import beam_decoder_for

        decoder = beam_decoder_for(self.fake_transcriber(), engine="auto")
        if jax.default_backend() != "tpu":
            assert type(decoder) is BeamStreamDecoder

    def test_lexicon_constraint_routes_to_xla(self, word_lm):
        from speechless_tpu.serving_streaming import beam_decoder_for

        fake = self.fake_transcriber(lexicon_constrained=True, word_lm=word_lm)
        decoder = beam_decoder_for(fake, engine="auto")
        assert type(decoder) is BeamStreamDecoder
        with pytest.raises(ValueError, match="XLA-only"):
            beam_decoder_for(fake, engine="pallas")

    def test_unknown_engine_rejected(self):
        from speechless_tpu.serving_streaming import beam_decoder_for

        with pytest.raises(ValueError, match="beam engine"):
            beam_decoder_for(self.fake_transcriber(), engine="cuda")

    def test_unpruned_config_is_xla_only(self):
        """An explicit prune_classes=None (unpruned beam) must never be silently
        re-pruned: explicit engine='pallas' rejects it, and 'auto' routes to XLA
        on every backend (the TPU branch requires prune_classes is not None)."""
        from speechless_tpu.serving_streaming import beam_decoder_for

        fake = self.fake_transcriber(_decoder={"beam_width": W,
                                               "prune_classes": None})
        with pytest.raises(ValueError, match="prune_classes"):
            beam_decoder_for(fake, engine="pallas")
        decoder = beam_decoder_for(fake, engine="auto")
        assert type(decoder) is BeamStreamDecoder
        assert decoder.prune_classes is None
