"""Word-ARPA builder tests: estimation sanity, ARPA round-trip through both scorers,
vocabulary file, and end-to-end fusion benefit (the `use_kenlm=True` workflow is now
runnable with zero external tools)."""
import math

import numpy as np
import pytest

from speechless_tpu.lm.arpa_builder import (BOS, EOS, UNK, WordNgramEstimator,
                                            build_kenlm_directory, write_vocabulary_file)
from speechless_tpu.lm.ngram import ArpaLanguageModel, load_language_model
from speechless_tpu.native import _native
from speechless_tpu.ops.decode import beam_search_decode

TRANSCRIPTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the cat saw the dog",
    "the dog ran to the mat",
    "a dog sat on a mat",
    "the cat ran to the rug",
    "cats and dogs run",
]


class TestEstimator:
    def test_probabilities_normalize(self, tmp_path):
        estimator = WordNgramEstimator(order=3)
        estimator.add_texts(TRANSCRIPTS)
        probabilities, _ = estimator.estimate()
        vocabulary = sorted(w for (w,) in probabilities[0])
        # Unigrams sum to 1 over the predictable vocabulary.
        assert sum(probabilities[0].values()) == pytest.approx(1.0, abs=1e-9)
        assert (UNK,) in probabilities[0] and probabilities[0][(UNK,)] > 0

        # Conditional distributions normalize through the emitted ARPA's real backoff
        # scoring: sum_w 10**score(ctx + w) == 1 for every context.
        lm = ArpaLanguageModel.load(estimator.write_arpa(tmp_path / "lm.arpa"))
        for context in [("the",), ("a",), ("the", "cat"), ("zebra",), (BOS,)]:
            total = sum(10.0 ** lm._score(context + (word,)) for word in vocabulary)
            assert total == pytest.approx(1.0, abs=1e-4), context

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            WordNgramEstimator(order=2).estimate()


class TestArpaRoundTrip:
    def test_python_scorer_loads_and_scores(self, tmp_path):
        estimator = WordNgramEstimator(order=3)
        estimator.add_texts(TRANSCRIPTS)
        arpa = estimator.write_arpa(tmp_path / "lm.arpa")
        lm = ArpaLanguageModel.load(arpa)
        assert lm.order == 3
        # Frequent continuation scores above a rare one.
        assert lm.score_word(["the"], "cat") > lm.score_word(["the"], "ran")
        # In-vocabulary checks.
        assert lm.is_valid_word("cat") and not lm.is_valid_word("zebra")
        # Full sentences score finite.
        assert math.isfinite(lm.score_sentence("the cat sat on the mat".split()))

    @pytest.mark.skipif(_native is None, reason="native extension unavailable")
    def test_native_scorer_parity(self, tmp_path):
        from speechless_tpu.lm.ngram import NativeArpaLanguageModel

        estimator = WordNgramEstimator(order=3)
        estimator.add_texts(TRANSCRIPTS)
        arpa = estimator.write_arpa(tmp_path / "lm.arpa")
        py = ArpaLanguageModel.load(arpa)
        native = NativeArpaLanguageModel(arpa)
        cases = [([], "the"), (["the"], "cat"), (["the", "cat"], "sat"),
                 (["a"], "dog"), (["the", "dog"], "zebra"), (["on"], "the"),
                 ([], "zebra"), (["cats", "and"], "dogs")]
        for context, word in cases:
            assert native.score_word(context, word) == pytest.approx(
                py.score_word(context, word), abs=1e-4), (context, word)
            assert native.is_valid_word(word) == py.is_valid_word(word)

    def test_build_kenlm_directory(self, tmp_path):
        characters = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
        directory = build_kenlm_directory(TRANSCRIPTS, tmp_path / "kenlm" / "en",
                                          allowed_characters=characters, order=2)
        assert (directory / "lm.arpa").exists()
        vocab_line = (directory / "vocabulary").read_text(encoding="utf8").splitlines()
        assert len(vocab_line) == 1 and list(vocab_line[0]) == characters
        assert load_language_model(directory) is not None


class TestFusionImprovesDecoding:
    def test_built_lm_steers_beam(self, tmp_path):
        # Acoustics mildly prefer the misspelling "the dog sat on the rag"; the built LM
        # (which saw "rug"/"mat" but never "rag") must flip the beam to a training word.
        characters = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
        blank = len(characters)
        directory = build_kenlm_directory(TRANSCRIPTS, tmp_path / "lm",
                                          allowed_characters=characters, order=3)
        lm = load_language_model(directory)

        text = "the dog sat on the rag"
        frames = []
        for i, char in enumerate(text):
            row = np.full(len(characters) + 1, 1e-6)
            row[characters.index(char)] = 1.0
            if char == "a" and text[max(i - 1, 0)] == "r":  # 'a' in "rag" ambiguous vs 'u'
                row[characters.index("u")] = 0.9
            frames.append(np.log(row / row.sum()))
        log_probs = np.array(frames, dtype=np.float32)[None]

        no_lm_tokens, no_lm_counts = beam_search_decode(
            log_probs, [len(text)], blank, beam_width=8)
        no_lm = "".join(characters[i] for i in no_lm_tokens[0, :no_lm_counts[0]])
        assert no_lm == "the dog sat on the rag"

        tokens, counts = beam_search_decode(
            log_probs, [len(text)], blank, beam_width=8, alphabet=characters, lm=lm,
            lm_weight=1.5, valid_word_count_weight=2.3)
        fused = "".join(characters[i] for i in tokens[0, :counts[0]])
        assert fused == "the dog sat on the rug"
