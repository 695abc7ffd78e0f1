"""Native (C++) prefix-beam-search parity vs the pure-Python reference implementation.

The C++ decoder (`speechless_tpu/native/beam_search.cpp`) is the production eval/serving
path (the reference used the forked-TF KenLM C++ decoder, `net.py:438-454`); these tests
pin it token-for-token to the Python beam — without an LM, with word-level ARPA fusion,
and with per-frame class pruning on peaky (trained-model-like) outputs.
"""
import math

import numpy as np
import pytest

from speechless_tpu.native import _native
from speechless_tpu.ops.decode import beam_search_decode, beam_search_decode_python

from tests.test_decode import aa_blank_aa_log_probs
from tests.test_lm import TEST_ARPA

pytestmark = pytest.mark.skipif(_native is None, reason="native extension unavailable")

ALPHABET = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
CLASSES = len(ALPHABET) + 1
BLANK = CLASSES - 1
SPACE = ALPHABET.index(" ")


@pytest.fixture
def native_lm(tmp_path):
    from speechless_tpu.lm.ngram import NativeArpaLanguageModel

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(TEST_ARPA)
    return NativeArpaLanguageModel(arpa)


def random_log_probs(rng, batch, frames, scale=1.5, space_boost_every=None):
    logits = rng.randn(batch, frames, CLASSES).astype(np.float32) * scale
    if space_boost_every:
        logits[:, ::space_boost_every, SPACE] += 4.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def decoded(tokens, counts):
    return ["".join(ALPHABET[i] for i in tokens[b, :counts[b]]) for b in range(len(counts))]


class TestNativeBeamParity:
    def test_contract_aa_blank_aa(self):
        tokens, counts = _native.ctc_beam_search(
            aa_blank_aa_log_probs().astype(np.float32), [5], blank=1, beam_width=8)
        assert counts[0] == 2 and list(tokens[0, :2]) == [0, 0]

    def test_no_lm_matches_python(self):
        rng = np.random.RandomState(0)
        lp = random_log_probs(rng, batch=4, frames=40)
        lengths = [40, 25, 1, 0]
        nt, nc = beam_search_decode(lp, lengths, blank=BLANK, beam_width=12)
        pt, pc = beam_search_decode_python(lp, lengths, blank=BLANK, beam_width=12)
        assert np.array_equal(nc, pc)
        assert np.array_equal(nt, pt)

    def test_lm_fusion_matches_python(self, native_lm):
        rng = np.random.RandomState(7)
        lp = random_log_probs(rng, batch=3, frames=50, space_boost_every=5)
        lengths = [50, 33, 12]
        nt, nc = beam_search_decode(lp, lengths, blank=BLANK, beam_width=12,
                                    alphabet=ALPHABET, lm=native_lm)
        pt, pc = beam_search_decode_python(lp, lengths, blank=BLANK, beam_width=12,
                                           alphabet=ALPHABET, lm=native_lm)
        assert decoded(nt, nc) == decoded(pt, pc)
        assert np.array_equal(nt, pt) and np.array_equal(nc, pc)

    def test_lm_fusion_matches_python_scorer(self, native_lm, tmp_path):
        # Full-circle: native beam + native scorer == python beam + python scorer.
        from speechless_tpu.lm.ngram import ArpaLanguageModel

        arpa = tmp_path / "pylm.arpa"
        arpa.write_text(TEST_ARPA)
        py_lm = ArpaLanguageModel.load(arpa)
        rng = np.random.RandomState(3)
        lp = random_log_probs(rng, batch=2, frames=45, space_boost_every=6)
        lengths = [45, 30]
        nt, nc = beam_search_decode(lp, lengths, blank=BLANK, beam_width=10,
                                    alphabet=ALPHABET, lm=native_lm)
        pt, pc = beam_search_decode_python(lp, lengths, blank=BLANK, beam_width=10,
                                           alphabet=ALPHABET, lm=py_lm)
        assert decoded(nt, nc) == decoded(pt, pc)

    def test_pruning_identical_on_peaky_outputs(self, native_lm):
        # Trained CTC outputs are near-one-hot; the 1e-5 class floor used by the system
        # facade must not change the decode.
        rng = np.random.RandomState(11)
        batch, frames = 4, 80
        logits = rng.randn(batch, frames, CLASSES).astype(np.float32) * 0.3
        winners = rng.randint(0, CLASSES, size=(batch, frames))
        winners[rng.rand(batch, frames) < 0.5] = BLANK
        for b in range(batch):
            logits[b, np.arange(frames), winners[b]] += 15.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        lengths = [frames] * batch
        exact = beam_search_decode(lp, lengths, blank=BLANK, beam_width=16,
                                   alphabet=ALPHABET, lm=native_lm)
        pruned = beam_search_decode(lp, lengths, blank=BLANK, beam_width=16,
                                    alphabet=ALPHABET, lm=native_lm,
                                    prune_log_prob_floor=math.log(1e-5))
        assert decoded(*exact) == decoded(*pruned)

    def test_zero_length_and_empty_frames(self):
        lp = random_log_probs(np.random.RandomState(1), batch=2, frames=6)
        tokens, counts = beam_search_decode(lp, [0, 0], blank=BLANK, beam_width=4)
        assert list(counts) == [0, 0]
        assert (tokens == -1).all()

    def test_dispatcher_uses_native_for_native_lm(self, native_lm):
        from speechless_tpu.ops.decode import _native_lm_handle

        assert _native_lm_handle(native_lm) is not None
        assert _native_lm_handle(None) is None
