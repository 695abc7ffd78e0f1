"""Pallas prefix-beam kernel parity vs the XLA beam (interpret mode on CPU)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from speechless_tpu.ops.decode_jax import beam_search_decode_jax
from speechless_tpu.ops.decode_pallas import beam_search_decode_pallas


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _log_probs(rng, batch, t_max, classes, blank, peaky=1.0):
    logits = rng.randn(batch, t_max, classes).astype(np.float32) * 2
    logits[:, :, blank] += peaky
    return jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))


class TestPallasBeamParity:
    @pytest.mark.parametrize("beam_width,prune", [(4, 3), (8, 5), (5, 6)])
    def test_tokens_match_xla_beam(self, rng, beam_width, prune):
        batch, t_max, classes = 3, 12, 6
        blank = classes - 1
        lp = _log_probs(rng, batch, t_max, classes, blank)
        lengths = jnp.asarray(np.array([12, 7, 1], np.int32))
        ref = beam_search_decode_jax(lp, lengths, blank, beam_width=beam_width,
                                     max_decoded_length=16, prune_classes=prune)
        new = beam_search_decode_pallas(lp, lengths, blank, beam_width=beam_width,
                                        max_decoded_length=16, prune_classes=prune)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))

    def test_dense_layout_matches_xla_beam(self, rng):
        """The (8, n/8) dense candidate layout (non-default; measured slower on v5e
        but kept for Mosaic tuning) agrees with the XLA beam; small shape because
        interpret mode emulates per-op."""
        batch, t_max, classes = 2, 10, 9
        blank = classes - 1
        lp = _log_probs(rng, batch, t_max, classes, blank)
        lengths = jnp.asarray(np.array([10, 6], np.int32))
        ref = beam_search_decode_jax(lp, lengths, blank, beam_width=8,
                                     max_decoded_length=8, prune_classes=7)
        new = beam_search_decode_pallas(lp, lengths, blank, beam_width=8,
                                        max_decoded_length=8, prune_classes=7,
                                        dense_layout=True)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))

    @pytest.mark.parametrize("seed", [1, 4, 6])
    def test_wide_beam_duplicate_mass_regression(self, seed):
        """Parity in the regime where distinct live prefixes < beam_width while merges
        occur (W=16 > 1 + k + k^2 = 7 at k=2): non-run-start duplicates after the
        segmented merge must NOT re-enter the beam with finite partial masses — a
        duplicate copy double-counts its mass at the next frame's merge and can flip
        the winner (round-2 advisor finding, decode_pallas.py:319). These seeds were
        measured to flip tokens without the duplicate-mass mask (41/60 seeds do)."""
        rng = np.random.RandomState(seed)
        batch, t_max, classes = 4, 16, 3
        blank = classes - 1
        lp = _log_probs(rng, batch, t_max, classes, blank, peaky=2.0)  # blank-peaky
        lengths = jnp.asarray(np.array([16, 11, 5, 2], np.int32))
        ref = beam_search_decode_jax(lp, lengths, blank, beam_width=16,
                                     max_decoded_length=20, prune_classes=2)
        new = beam_search_decode_pallas(lp, lengths, blank, beam_width=16,
                                        max_decoded_length=20, prune_classes=2)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))

    def test_wide_beam_small_alphabet_w25(self, rng):
        """W=25 with a tiny alphabet keeps live-prefix count below W for many frames;
        pins the same duplicate regime at the production beam width."""
        batch, t_max, classes = 2, 10, 4
        blank = classes - 1
        lp = _log_probs(rng, batch, t_max, classes, blank, peaky=1.5)
        lengths = jnp.full((batch,), t_max, jnp.int32)
        ref = beam_search_decode_jax(lp, lengths, blank, beam_width=25,
                                     max_decoded_length=16, prune_classes=3)
        new = beam_search_decode_pallas(lp, lengths, blank, beam_width=25,
                                        max_decoded_length=16, prune_classes=3)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))

    def test_merge_repeated_false_contract(self):
        """'AA<blank>AA' -> 'AA' (reference test_ctc_decoders.py semantics)."""
        probs = np.full((1, 5, 2), 1e-6, np.float32)
        probs[0, 0, 0] = probs[0, 1, 0] = 1.0  # A A
        probs[0, 2, 1] = 1.0                   # blank
        probs[0, 3, 0] = probs[0, 4, 0] = 1.0  # A A
        lp = jnp.asarray(np.log(probs / probs.sum(-1, keepdims=True)))
        tokens, counts = beam_search_decode_pallas(lp, jnp.asarray([5]), blank=1,
                                                   beam_width=4, max_decoded_length=8,
                                                   prune_classes=2)
        assert int(counts[0]) == 2
        assert np.asarray(tokens)[0, :2].tolist() == [0, 0]

    def test_capacity_cap(self, rng):
        """max_decoded_length bounds emissions without desyncing counts."""
        batch, t_max, classes = 2, 20, 4
        blank = classes - 1
        lp = _log_probs(rng, batch, t_max, classes, blank, peaky=-3.0)  # non-blank heavy
        lengths = jnp.full((batch,), t_max, jnp.int32)
        tokens, counts = beam_search_decode_pallas(lp, lengths, blank, beam_width=4,
                                                   max_decoded_length=6,
                                                   prune_classes=3)
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        assert (counts <= 6).all()
        for b in range(batch):
            assert (tokens[b, :counts[b]] >= 0).all()
            assert (tokens[b, counts[b]:] == -1).all()

    def test_blank_skip_fast_path_matches_on_confident_blanks(self, rng):
        """Frames with blank prob > threshold via the fast path: identical output when
        the model is genuinely confident."""
        batch, t_max, classes = 2, 12, 5
        blank = classes - 1
        logits = rng.randn(batch, t_max, classes).astype(np.float32)
        # Make every other frame extremely blank-confident.
        confident = np.zeros((batch, t_max), bool)
        confident[:, 1::2] = True
        logits[confident, blank] = 20.0
        lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        lengths = jnp.full((batch,), t_max, jnp.int32)
        exact = beam_search_decode_pallas(lp, lengths, blank, beam_width=6,
                                          max_decoded_length=12, prune_classes=4)
        skip = beam_search_decode_pallas(lp, lengths, blank, beam_width=6,
                                         max_decoded_length=12, prune_classes=4,
                                         skip_blank_log_prob=math.log(0.999))
        np.testing.assert_array_equal(np.asarray(exact[0]), np.asarray(skip[0]))
        np.testing.assert_array_equal(np.asarray(exact[1]), np.asarray(skip[1]))
