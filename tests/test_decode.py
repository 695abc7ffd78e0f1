"""Decoder-semantics contract tests.

The key contract is the reference's `test_ctc_decoders.py` matrix for input "AA<blank>AA":
greedy (merge_repeated=True) -> "AA"; beam/prefix search -> "AA" (not "A", not "AAAA")."""
import numpy as np
import jax.numpy as jnp

from speechless_tpu.ops.decode import beam_search_decode, greedy_decode


def aa_blank_aa_log_probs():
    """5 frames, 2 classes (A=0, blank=1): A A <blank> A A, near-one-hot."""
    probs = np.full((1, 5, 2), 1e-8)
    for t, c in enumerate([0, 0, 1, 0, 0]):
        probs[0, t, c] = 1.0
    return np.log(probs / probs.sum(-1, keepdims=True))


class TestGreedyDecode:
    def test_aa_blank_aa_contract(self):
        tokens, counts = greedy_decode(jnp.asarray(aa_blank_aa_log_probs()),
                                       jnp.asarray([5]), blank=1)
        assert counts[0] == 2
        assert list(np.asarray(tokens[0, :2])) == [0, 0]

    def test_merges_and_strips(self):
        # b b b <blank> b a a -> "b b a" after merge+strip
        probs = np.full((1, 7, 3), 1e-6)
        for t, c in enumerate([1, 1, 1, 2, 1, 0, 0]):
            probs[0, t, c] = 1.0
        tokens, counts = greedy_decode(jnp.asarray(np.log(probs)), jnp.asarray([7]), blank=2)
        assert counts[0] == 3
        assert list(np.asarray(tokens[0, :3])) == [1, 1, 0]

    def test_respects_lengths(self):
        probs = np.full((2, 4, 3), 1e-6)
        for t in range(4):
            probs[:, t, t % 2] = 1.0  # a b a b
        tokens, counts = greedy_decode(jnp.asarray(np.log(probs)), jnp.asarray([4, 2]), blank=2)
        assert counts[0] == 4 and counts[1] == 2
        assert list(np.asarray(tokens[1])) == [0, 1, -1, -1]

    def test_padding_is_minus_one(self):
        tokens, _ = greedy_decode(jnp.asarray(aa_blank_aa_log_probs()), jnp.asarray([5]), blank=1)
        assert list(np.asarray(tokens[0, 2:])) == [-1, -1, -1]


class TestBeamSearchDecode:
    def test_aa_blank_aa_contract_width1(self):
        tokens, counts = beam_search_decode(aa_blank_aa_log_probs(), [5], blank=1, beam_width=1)
        assert counts[0] == 2
        assert list(tokens[0, :2]) == [0, 0]

    def test_aa_blank_aa_contract_wide(self):
        tokens, counts = beam_search_decode(aa_blank_aa_log_probs(), [5], blank=1, beam_width=8)
        assert counts[0] == 2

    def test_beam_sums_paths_greedy_does_not(self):
        # Classic case where prefix beam search beats greedy: per-frame argmax is blank,
        # but summing paths makes "a" more likely than "".
        probs = np.array([[[0.4, 0.6], [0.4, 0.6]]])  # p(a)=.4, p(blank)=.6 twice
        # P("") = .36; P("a") = .4*.6 + .6*.4 + .4*.4 = .64
        tokens, counts = beam_search_decode(np.log(probs), [2], blank=1, beam_width=4)
        assert counts[0] == 1
        assert tokens[0, 0] == 0
        g_tokens, g_counts = greedy_decode(jnp.asarray(np.log(probs)), jnp.asarray([2]), blank=1)
        assert g_counts[0] == 0  # greedy stays with blank-blank -> ""

    def test_batch_and_lengths(self):
        lp = np.concatenate([aa_blank_aa_log_probs(), aa_blank_aa_log_probs()], axis=0)
        tokens, counts = beam_search_decode(lp, [5, 2], blank=1, beam_width=4)
        assert counts[0] == 2 and counts[1] == 1  # only "AA" prefix seen in 2 frames -> "A"
