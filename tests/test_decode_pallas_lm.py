"""Word-LM-fused Pallas beam (ops/decode_pallas_lm.py) parity vs the XLA word-LM beam,
and the device-beam dispatcher's routing (ops/device_beam.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from speechless_tpu.lm.arpa_builder import build_kenlm_directory
from speechless_tpu.lm.device_lm import build_device_word_lm
from speechless_tpu.lm.ngram import ArpaLanguageModel
from speechless_tpu.ops.decode_jax import beam_search_decode_jax
from speechless_tpu.ops.decode_pallas_lm import beam_search_decode_pallas_lm
from speechless_tpu.ops.device_beam import beam_search_decode_device

ALPHABET = list("abcdefghijklmnopqrstuvwxyz '")
BLANK = len(ALPHABET)

TEXTS = ["the cat sat on the mat",
         "the cat ran to the dog",
         "a dog sat on a log",
         "the dog ran to the cat",
         "it's the cat on the mat",
         "a cat and a dog ran"]

WEIGHTS = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)


@pytest.fixture(scope="module")
def device_lm(tmp_path_factory):
    directory = tmp_path_factory.mktemp("lm")
    build_kenlm_directory(TEXTS, directory, allowed_characters=ALPHABET, order=3)
    arpa = ArpaLanguageModel.load(directory / "lm.arpa")
    return build_device_word_lm(arpa, ALPHABET)


def _peaky_log_probs(text, peak=8.0, rng=None):
    frames = []
    for c in text:
        for symbol in (ALPHABET.index(c), BLANK):
            row = np.zeros(len(ALPHABET) + 1)
            row[symbol] = peak
            frames.append(row)
    logits = np.asarray(frames, dtype=np.float64)
    if rng is not None:
        logits = logits + rng.randn(*logits.shape) * 1.5
    return logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))


def _batch(texts, peak=8.0, rngs=None):
    """Batch utterances of different lengths, -inf padded via repeated last frame
    masked by lengths."""
    per = [_peaky_log_probs(t, peak, None if rngs is None else rngs[i])
           for i, t in enumerate(texts)]
    t_max = max(p.shape[0] for p in per)
    lp = np.full((len(per), t_max, len(ALPHABET) + 1), -30.0)
    lengths = np.zeros(len(per), np.int32)
    for i, p in enumerate(per):
        lp[i, :p.shape[0]] = p
        lengths[i] = p.shape[0]
    return jnp.asarray(lp, jnp.float32), jnp.asarray(lengths)


def _assert_parity(lp, lengths, device_lm, width=8, prune=8, max_len=64):
    ref = beam_search_decode_jax(lp, lengths, blank=BLANK, beam_width=width,
                                 max_decoded_length=max_len, word_lm=device_lm,
                                 prune_classes=prune, **WEIGHTS)
    new = beam_search_decode_pallas_lm(lp, lengths, blank=BLANK, word_lm=device_lm,
                                       beam_width=width, max_decoded_length=max_len,
                                       prune_classes=prune, **WEIGHTS)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))


class TestPallasLmBeamParity:
    def test_peaky_batch_matches_xla_word_lm_beam(self, device_lm):
        lp, lengths = _batch(["the cat sat", "a dog ran", "the mat"])
        _assert_parity(lp, lengths, device_lm)

    def test_noisy_outputs_match(self, device_lm):
        rngs = [np.random.RandomState(s) for s in range(3)]
        lp, lengths = _batch(["the cat ran to the dog", "a dog sat on a log",
                              "it's the cat"], peak=3.0, rngs=rngs)
        _assert_parity(lp, lengths, device_lm)

    def test_oov_and_partial_words_match(self, device_lm):
        lp, lengths = _batch(["the zzz cat", "the ca", " the  cat"])
        _assert_parity(lp, lengths, device_lm)

    def test_batch_not_multiple_of_sublanes(self, device_lm):
        """9 utterances exercise the batch padding to the 8-sublane grid."""
        texts = ["the cat", "a dog", "the mat", "a log", "the dog ran",
                 "it's a cat", "the", "a", "dog"]
        lp, lengths = _batch(texts, peak=6.0)
        _assert_parity(lp, lengths, device_lm, width=4)

    def test_lm_flips_ambiguous_decode(self, device_lm):
        """The 'mat'/'mot' flip case from test_device_word_lm through the kernel."""
        lp = _peaky_log_probs("the mat")
        a_frame = 2 * len("the m")
        row = lp[a_frame].copy()
        row[ALPHABET.index("o")] = row[ALPHABET.index("a")] + 0.4
        lp[a_frame] = row - np.log(np.exp(row).sum())
        lp = jnp.asarray(lp[None], jnp.float32)
        lengths = jnp.asarray([lp.shape[1]])
        no_lm_tokens, no_lm_counts = beam_search_decode_jax(
            lp, lengths, blank=BLANK, beam_width=8, max_decoded_length=64)
        tokens, counts = beam_search_decode_pallas_lm(
            lp, lengths, blank=BLANK, word_lm=device_lm, beam_width=8,
            max_decoded_length=64, prune_classes=8, **WEIGHTS)
        no_lm = "".join(ALPHABET[t] for t in np.asarray(no_lm_tokens)[0, :int(no_lm_counts[0])])
        fused = "".join(ALPHABET[t] for t in np.asarray(tokens)[0, :int(counts[0])])
        assert no_lm == "the mot"
        assert fused == "the mat"

    def test_wide_beam_w25(self, device_lm):
        """Production width: more beams than live prefixes early on (duplicate-mass
        regime) plus LM fusion."""
        lp, lengths = _batch(["the cat sat on the mat"], peak=3.0,
                             rngs=[np.random.RandomState(7)])
        _assert_parity(lp, lengths, device_lm, width=25)


class TestFramesKernelNoLm:
    """The frame-step kernel without an LM (`beam_search_decode_pallas_frames`) — the
    dispatcher's default no-LM path — must match the XLA beam token-for-token."""

    def _assert_no_lm_parity(self, lp, lengths, width=8, prune=8, max_len=64):
        from speechless_tpu.ops.decode_pallas_lm import beam_search_decode_pallas_frames

        ref = beam_search_decode_jax(lp, lengths, blank=BLANK, beam_width=width,
                                     max_decoded_length=max_len, prune_classes=prune)
        new = beam_search_decode_pallas_frames(lp, lengths, blank=BLANK,
                                               beam_width=width,
                                               max_decoded_length=max_len,
                                               prune_classes=prune)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(new[1]))

    def test_peaky_batch(self):
        lp, lengths = _batch(["the cat sat", "a dog ran", "the mat"])
        self._assert_no_lm_parity(lp, lengths)

    def test_noisy_uneven_lengths(self):
        rngs = [np.random.RandomState(s) for s in range(3)]
        lp, lengths = _batch(["the cat ran to the dog", "a dog sat on a log",
                              "it's the cat"], peak=3.0, rngs=rngs)
        self._assert_no_lm_parity(lp, lengths)

    def test_wide_beam_w25_duplicate_mass_regime(self):
        lp, lengths = _batch(["the cat sat on the mat"], peak=3.0,
                             rngs=[np.random.RandomState(7)])
        self._assert_no_lm_parity(lp, lengths, width=25)

    def test_batch_padding_to_sublane_grid(self):
        texts = ["the cat", "a dog", "the mat", "a log", "the dog ran",
                 "it's a cat", "the", "a", "dog"]
        lp, lengths = _batch(texts, peak=6.0)
        self._assert_no_lm_parity(lp, lengths, width=4)


class TestDeviceBeamDispatch:
    def test_word_lm_routes_to_pallas_and_matches(self, device_lm):
        lp, lengths = _batch(["the cat sat"])
        via_dispatch = beam_search_decode_device(
            lp, lengths, blank=BLANK, beam_width=8, max_decoded_length=64,
            word_lm=device_lm, prune_classes=8, **WEIGHTS)
        direct = beam_search_decode_pallas_lm(
            lp, lengths, blank=BLANK, word_lm=device_lm, beam_width=8,
            max_decoded_length=64, prune_classes=8, **WEIGHTS)
        np.testing.assert_array_equal(np.asarray(via_dispatch[0]), np.asarray(direct[0]))

    def test_oversized_charset_falls_back_to_xla(self, caplog):
        """classes + 2*prune > 128 must decode (XLA fallback), not raise."""
        import logging

        rng = np.random.RandomState(0)
        classes, blank = 120, 119
        logits = rng.randn(2, 6, classes).astype(np.float32)
        lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        lengths = jnp.asarray([6, 4])
        with caplog.at_level(logging.INFO, logger="speechless_tpu.ops.device_beam"):
            tokens, counts = beam_search_decode_device(
                lp, lengths, blank=blank, beam_width=4, prune_classes=8,
                max_decoded_length=8)
        ref = beam_search_decode_jax(lp, lengths, blank=blank, beam_width=4,
                                     max_decoded_length=8, prune_classes=8)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(tokens))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(counts))
        assert any("XLA beam" in r.message for r in caplog.records)

    def test_unpruned_search_falls_back_to_xla(self):
        rng = np.random.RandomState(1)
        classes, blank = 5, 4
        logits = rng.randn(1, 8, classes).astype(np.float32)
        lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        lengths = jnp.asarray([8])
        tokens, counts = beam_search_decode_device(
            lp, lengths, blank=blank, beam_width=4, prune_classes=None,
            max_decoded_length=8)
        ref = beam_search_decode_jax(lp, lengths, blank=blank, beam_width=4,
                                     max_decoded_length=8)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(tokens))

    def test_no_lm_routes_to_pallas_kernel(self):
        from speechless_tpu.ops.decode_pallas import beam_search_decode_pallas

        rng = np.random.RandomState(2)
        classes, blank = 6, 5
        logits = rng.randn(2, 10, classes).astype(np.float32)
        lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        lengths = jnp.asarray([10, 7])
        via_dispatch = beam_search_decode_device(
            lp, lengths, blank=blank, beam_width=4, prune_classes=5,
            max_decoded_length=8)
        direct = beam_search_decode_pallas(
            lp, lengths, blank=blank, beam_width=4, prune_classes=5,
            max_decoded_length=8)
        np.testing.assert_array_equal(np.asarray(via_dispatch[0]), np.asarray(direct[0]))
