"""Word-level LM fusion on device (lm/device_lm.py + decode_jax word_lm path).

Parity targets:
* `score_word_device` must equal `ArpaLanguageModel.score_word` for EVERY
  (context, word) combination, including OOV words/context and sentence starts;
* the on-device beam with `word_lm` must match the host word-LM prefix beam
  (`decode.beam_search_decode_python`) token-for-token on peaky and moderately noisy
  outputs (identical weights, including word/valid-word bonuses and the trailing-word
  final ranking).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from speechless_tpu.lm.arpa_builder import build_kenlm_directory
from speechless_tpu.lm.device_lm import build_device_word_lm, score_word_device
from speechless_tpu.lm.ngram import ArpaLanguageModel, BOS, UNK
from speechless_tpu.ops.decode import beam_search_decode_python
from speechless_tpu.ops.decode_jax import beam_search_decode_jax

ALPHABET = list("abcdefghijklmnopqrstuvwxyz '")
BLANK = len(ALPHABET)  # classes = alphabet + blank (CTC blank=last)

TEXTS = ["the cat sat on the mat",
         "the cat ran to the dog",
         "a dog sat on a log",
         "the dog ran to the cat",
         "it's the cat on the mat",
         "a cat and a dog ran"]


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    directory = tmp_path_factory.mktemp("lm")
    build_kenlm_directory(TEXTS, directory, allowed_characters=ALPHABET, order=3)
    return ArpaLanguageModel.load(directory / "lm.arpa")


@pytest.fixture(scope="module")
def device_lm(arpa):
    return build_device_word_lm(arpa, ALPHABET)


class TestScorerParity:
    def test_all_context_word_combinations(self, arpa, device_lm):
        words = sorted(arpa.vocabulary) + ["zzz"]  # incl. an OOV word
        contexts = ([()]
                    + [(w,) for w in words]
                    + [("the", w) for w in words]
                    + [("zzz", "cat"), ("zzz", "zzz"), ("cat", "zzz")])
        word_id = {g[0]: i for i, g in enumerate(sorted(arpa._log_probs[0].keys()))}

        def ids_for(context):
            padded = (BOS, BOS) + tuple(
                w if (w,) in arpa._log_probs[0] else UNK for w in context)
            return word_id[padded[-2]], word_id[padded[-1]]

        c1s, c2s, ws, expected = [], [], [], []
        for context in contexts:
            for word in words:
                c1, c2 = ids_for(context)
                c1s.append(c1)
                c2s.append(c2)
                normalized = word if (word,) in arpa._log_probs[0] else UNK
                ws.append(word_id[normalized])
                expected.append(arpa.score_word(list(context), word))
        got = np.asarray(score_word_device(
            device_lm.as_device(), jnp.asarray(c1s, jnp.int32),
            jnp.asarray(c2s, jnp.int32), jnp.asarray(ws, jnp.int32)))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_trie_walks_vocabulary(self, arpa, device_lm):
        char_ids = {c: i for i, c in enumerate(ALPHABET)}
        word_id = {g[0]: i for i, g in enumerate(sorted(arpa._log_probs[0].keys()))}
        for word in arpa.vocabulary:
            node = 0
            for c in word:
                node = int(device_lm.trie[node, char_ids[c]])
                assert node > 0, (word, c)
            assert int(device_lm.node_word[node]) == word_id[word]
        # A non-word prefix dies.
        node = int(device_lm.trie[0, char_ids["x"]])
        assert node == -1


def _peaky_log_probs(text: str, peak=8.0, rng=None):
    """Logits peaked on the target characters (two frames per char with a blank gap)."""
    frames = []
    for c in text:
        for symbol in (ALPHABET.index(c), BLANK):
            row = np.zeros(len(ALPHABET) + 1)
            row[symbol] = peak
            frames.append(row)
    logits = np.asarray(frames, dtype=np.float64)
    if rng is not None:
        logits = logits + rng.randn(*logits.shape) * 1.5
    logits = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return logits[None, :, :]


class TestBeamParity:
    WEIGHTS = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)

    def _device(self, log_probs, lengths, device_lm, width):
        tokens, counts = beam_search_decode_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
            blank=BLANK, beam_width=width, max_decoded_length=64,
            word_lm=device_lm, **self.WEIGHTS)
        return np.asarray(tokens), np.asarray(counts)

    def _host(self, log_probs, lengths, arpa, width):
        return beam_search_decode_python(
            log_probs, lengths, blank=BLANK, beam_width=width, alphabet=ALPHABET,
            lm=arpa, **self.WEIGHTS)

    def _assert_same(self, log_probs, arpa, device_lm, width=8):
        lengths = [log_probs.shape[1]]
        host_tokens, host_counts = self._host(log_probs, lengths, arpa, width)
        dev_tokens, dev_counts = self._device(log_probs, lengths, device_lm, width)
        assert dev_counts[0] == host_counts[0]
        np.testing.assert_array_equal(dev_tokens[0, :dev_counts[0]],
                                      host_tokens[0, :host_counts[0]])

    def test_peaky_matches_host(self, arpa, device_lm):
        self._assert_same(_peaky_log_probs("the cat sat"), arpa, device_lm)

    def test_oov_word_matches_host(self, arpa, device_lm):
        self._assert_same(_peaky_log_probs("the zzz cat"), arpa, device_lm)

    def test_trailing_partial_word_matches_host(self, arpa, device_lm):
        self._assert_same(_peaky_log_probs("the ca"), arpa, device_lm)

    def test_leading_and_double_space_matches_host(self, arpa, device_lm):
        self._assert_same(_peaky_log_probs(" the  cat"), arpa, device_lm)

    def test_noisy_outputs_match_host(self, arpa, device_lm):
        rng = np.random.RandomState(0)
        for seed in range(4):
            log_probs = _peaky_log_probs("the cat ran to the dog", peak=3.0,
                                         rng=np.random.RandomState(seed))
            self._assert_same(log_probs, arpa, device_lm, width=8)

    def test_serving_transcriber_with_word_lm(self, tmp_path, arpa, device_lm):
        """`Transcriber(kenlm_directory=...)`: the LM-fused beam runs inside the serving
        program (features -> model -> beam in one jit), no host round-trip."""
        import jax
        from speechless_tpu.lm.arpa_builder import build_kenlm_directory
        from speechless_tpu.models import wav2letter as w2l
        from speechless_tpu.serving import Transcriber

        lm_dir = tmp_path / "kenlm"
        build_kenlm_directory(TEXTS, lm_dir, allowed_characters=ALPHABET, order=3)
        config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                      grapheme_set_size=BLANK + 1)
        params = w2l.init_params(config, jax.random.PRNGKey(0))
        transcriber = Transcriber(config, params, ALPHABET, kenlm_directory=lm_dir,
                                  beam_width=4, sample_buckets=(16384,))
        audio = np.random.RandomState(0).randn(12000).astype(np.float32) * 0.1
        text = transcriber.transcribe_audio(audio)
        assert isinstance(text, str)
        assert transcriber.word_lm is not None

    def test_class_pruning_is_output_identical_on_peaky_outputs(self, arpa, device_lm):
        for text in ("the cat sat", "a dog ran to the log"):
            log_probs = _peaky_log_probs(text)
            lengths = jnp.asarray([log_probs.shape[1]], jnp.int32)
            exact = beam_search_decode_jax(
                jnp.asarray(log_probs, jnp.float32), lengths, blank=BLANK, beam_width=8,
                max_decoded_length=64, word_lm=device_lm, **self.WEIGHTS)
            pruned = beam_search_decode_jax(
                jnp.asarray(log_probs, jnp.float32), lengths, blank=BLANK, beam_width=8,
                max_decoded_length=64, word_lm=device_lm, prune_classes=8, **self.WEIGHTS)
            np.testing.assert_array_equal(np.asarray(exact[0]), np.asarray(pruned[0]))
            np.testing.assert_array_equal(np.asarray(exact[1]), np.asarray(pruned[1]))

    def test_fusion_changes_decode_toward_language(self, arpa, device_lm):
        """An acoustically ambiguous 'mat'/'mot' case: the LM (which only knows 'mat')
        must flip the device decode the same way it flips the host decode."""
        log_probs = _peaky_log_probs("the mat", peak=8.0)
        # Make the 'a' of 'mat' acoustically lean slightly toward 'o'.
        a_frame = 2 * len("the m")
        row = log_probs[0, a_frame].copy()
        row[ALPHABET.index("o")] = row[ALPHABET.index("a")] + 0.4
        log_probs[0, a_frame] = row - np.log(np.exp(row).sum())
        no_lm_tokens, no_lm_counts = beam_search_decode_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray([log_probs.shape[1]]),
            blank=BLANK, beam_width=8, max_decoded_length=64)
        with_tokens, with_counts = self._device(log_probs, [log_probs.shape[1]],
                                                device_lm, 8)
        no_lm = "".join(ALPHABET[t] for t in no_lm_tokens[0, :no_lm_counts[0]])
        fused = "".join(ALPHABET[t] for t in with_tokens[0, :with_counts[0]])
        host_tokens, host_counts = self._host(log_probs, [log_probs.shape[1]], arpa, 8)
        host = "".join(ALPHABET[t] for t in host_tokens[0, :host_counts[0]])
        assert fused == host
        assert no_lm == "the mot"
        assert fused != no_lm  # the LM pulled the decode toward vocabulary words


class TestNbestWithWordLm:
    WEIGHTS = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)

    def test_top1_matches_lm_fused_best_search(self, device_lm):
        from speechless_tpu.ops.decode_jax import beam_search_nbest_jax

        rng = np.random.RandomState(7)
        log_probs = _peaky_log_probs("the cat sat", rng=rng)
        lengths = np.asarray([log_probs.shape[1]])
        best_tokens, best_counts = beam_search_decode_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
            blank=BLANK, beam_width=8, max_decoded_length=64,
            word_lm=device_lm, **self.WEIGHTS)
        nbest_tokens, nbest_counts, scores = beam_search_nbest_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
            blank=BLANK, nbest=4, beam_width=8, max_decoded_length=64,
            word_lm=device_lm, **self.WEIGHTS)
        np.testing.assert_array_equal(np.asarray(nbest_tokens[:, 0]),
                                      np.asarray(best_tokens))
        np.testing.assert_array_equal(np.asarray(nbest_counts[:, 0]),
                                      np.asarray(best_counts))
        scores = np.asarray(scores)[0]
        alive = scores > -1e29
        assert alive[0] and np.all(np.diff(scores[alive]) <= 1e-6)


class TestLexiconConstrained:
    WEIGHTS = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)

    def _decode_text(self, tokens, counts):
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        return "".join(ALPHABET[t] for t in tokens[0, : counts[0]])

    def test_in_vocabulary_text_is_unchanged(self, arpa, device_lm):
        log_probs = _peaky_log_probs("the cat sat on the mat")
        lengths = np.asarray([log_probs.shape[1]])
        args = (jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32))
        open_tokens, open_counts = beam_search_decode_jax(
            *args, blank=BLANK, beam_width=8, max_decoded_length=64,
            word_lm=device_lm, **self.WEIGHTS)
        constrained_tokens, constrained_counts = beam_search_decode_jax(
            *args, blank=BLANK, beam_width=8, max_decoded_length=64,
            word_lm=device_lm, lexicon_constrained=True, **self.WEIGHTS)
        np.testing.assert_array_equal(np.asarray(constrained_tokens),
                                      np.asarray(open_tokens))
        np.testing.assert_array_equal(np.asarray(constrained_counts),
                                      np.asarray(open_counts))
        assert self._decode_text(constrained_tokens, constrained_counts) \
            == "the cat sat on the mat"

    def test_oov_acoustics_decode_to_vocabulary_words(self, arpa, device_lm):
        # The acoustics spell an out-of-vocabulary word; the open beam transcribes it
        # verbatim, the constrained beam must stay on the trie.
        log_probs = _peaky_log_probs("the car sat", peak=3.0)  # "car" is OOV
        lengths = np.asarray([log_probs.shape[1]])
        args = (jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32))
        open_tokens, open_counts = beam_search_decode_jax(
            *args, blank=BLANK, beam_width=16, max_decoded_length=64,
            word_lm=device_lm, **self.WEIGHTS)
        assert "car" in self._decode_text(open_tokens, open_counts)
        constrained_tokens, constrained_counts = beam_search_decode_jax(
            *args, blank=BLANK, beam_width=16, max_decoded_length=64,
            word_lm=device_lm, lexicon_constrained=True, **self.WEIGHTS)
        text = self._decode_text(constrained_tokens, constrained_counts)
        words = [word for word in text.split(" ") if word]
        assert words, "constrained decode emitted nothing"
        # Every COMPLETE word (all but possibly the trailing one) is in-vocabulary;
        # the trailing word may be a prefix of a vocabulary word.
        for word in words[:-1]:
            assert arpa.is_valid_word(word), "{!r} not in vocabulary ({})".format(
                word, text)
        vocabulary = sorted(arpa.vocabulary)
        assert any(v.startswith(words[-1]) for v in vocabulary), \
            "trailing {!r} is not a vocabulary-word prefix ({})".format(words[-1], text)

    def test_noisy_outputs_always_stay_on_the_lexicon(self, arpa, device_lm):
        rng = np.random.RandomState(11)
        for text in ("the cat sat on the mat", "a dog ran to the log"):
            log_probs = _peaky_log_probs(text, peak=2.0, rng=rng)
            lengths = np.asarray([log_probs.shape[1]])
            tokens, counts = beam_search_decode_jax(
                jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
                blank=BLANK, beam_width=16, max_decoded_length=64,
                word_lm=device_lm, lexicon_constrained=True, **self.WEIGHTS)
            decoded = self._decode_text(tokens, counts)
            words = [word for word in decoded.split(" ") if word]
            for word in words[:-1]:
                assert arpa.is_valid_word(word), "{!r} off-lexicon in {!r}".format(
                    word, decoded)
            if words:
                assert any(v.startswith(words[-1]) for v in sorted(arpa.vocabulary))

    def test_requires_word_lm(self):
        log_probs = jnp.zeros((1, 4, 5))
        lengths = jnp.asarray([4], jnp.int32)
        with pytest.raises(ValueError, match="lexicon_constrained"):
            beam_search_decode_jax(log_probs, lengths, blank=4, beam_width=4,
                                   lexicon_constrained=True)

    def test_nbest_under_lexicon_constraint(self, arpa, device_lm):
        from speechless_tpu.ops.decode_jax import beam_search_nbest_jax

        log_probs = _peaky_log_probs("the cat", peak=3.0)
        lengths = np.asarray([log_probs.shape[1]])
        tokens, counts, scores = beam_search_nbest_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
            blank=BLANK, nbest=3, beam_width=16, max_decoded_length=64,
            word_lm=device_lm, lexicon_constrained=True, **self.WEIGHTS)
        tokens, counts, scores = (np.asarray(tokens)[0], np.asarray(counts)[0],
                                  np.asarray(scores)[0])
        for i in range(3):
            if scores[i] <= -1e29:
                continue
            decoded = "".join(ALPHABET[t] for t in tokens[i, : counts[i]])
            for word in [w for w in decoded.split(" ") if w][:-1]:
                assert arpa.is_valid_word(word)

    def test_device_dispatcher_routes_constrained_search(self, arpa, device_lm):
        from speechless_tpu.ops.device_beam import beam_search_decode_device

        log_probs = _peaky_log_probs("the car sat", peak=3.0)
        lengths = np.asarray([log_probs.shape[1]])
        tokens, counts = beam_search_decode_device(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths, jnp.int32),
            blank=BLANK, beam_width=16, max_decoded_length=64, prune_classes=8,
            word_lm=device_lm, lexicon_constrained=True, **self.WEIGHTS)
        decoded = self._decode_text(tokens, counts)
        for word in [w for w in decoded.split(" ") if w][:-1]:
            assert arpa.is_valid_word(word), decoded

    def test_device_dispatcher_rejects_conflicting_options(self, device_lm):
        """The routing layer names the real conflict instead of silently dropping an
        option (skip_blank) or failing with a misleading message (lm_table)."""
        from speechless_tpu.ops.device_beam import beam_search_decode_device

        classes = len(ALPHABET) + 1
        log_probs = jnp.zeros((1, 4, classes), jnp.float32)
        lengths = jnp.asarray([4], jnp.int32)
        with pytest.raises(ValueError, match="skip_blank"):
            beam_search_decode_device(
                log_probs, lengths, blank=BLANK, beam_width=4,
                word_lm=device_lm, lexicon_constrained=True,
                skip_blank_log_prob=-0.5)
        with pytest.raises(ValueError, match="word-level"):
            beam_search_decode_device(
                log_probs, lengths, blank=BLANK, beam_width=4,
                lm_table=jnp.zeros((classes, classes), jnp.float32),
                lexicon_constrained=True)
