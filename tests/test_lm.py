"""ARPA language model tests: parsing, back-off scoring, native/Python parity, beam fusion."""
import math

import numpy as np
import pytest

from speechless_tpu.lm.ngram import (ArpaLanguageModel, NativeArpaLanguageModel,
                                     load_language_model)
from speechless_tpu.native import _native
from speechless_tpu.ops.decode import beam_search_decode

TEST_ARPA = """\
\\data\\
ngram 1=7
ngram 2=4

\\1-grams:
-1.0\t<unk>
-0.8\t<s>\t-0.5
-1.2\t</s>
-0.5\tthe\t-0.3
-0.7\tcat\t-0.2
-0.9\tsat\t-0.1
-1.1\tdog

\\2-grams:
-0.2\t<s> the
-0.3\tthe cat
-0.4\tcat sat
-0.6\tthe dog

\\end\\
"""


@pytest.fixture
def arpa_file(tmp_path):
    path = tmp_path / "lm.arpa"
    path.write_text(TEST_ARPA)
    return path


class TestPythonArpa:
    def test_load_and_bigram_scores(self, arpa_file):
        lm = ArpaLanguageModel.load(arpa_file)
        assert lm.order == 2
        # Direct bigram hits.
        assert lm.score_word([], "the") == pytest.approx(-0.2)      # <s> the
        assert lm.score_word(["the"], "cat") == pytest.approx(-0.3)
        # Back-off: "sat dog" unseen -> backoff(sat) + p(dog) = -0.1 + -1.1
        assert lm.score_word(["the", "cat", "sat"], "dog") == pytest.approx(-1.2)
        # Unknown word -> <unk>, with context backoff applied: backoff(cat) + p(<unk>)
        assert lm.score_word(["the", "cat"], "zebra") == pytest.approx(-0.2 + -1.0)

    def test_vocabulary(self, arpa_file):
        lm = ArpaLanguageModel.load(arpa_file)
        assert lm.is_valid_word("cat")
        assert not lm.is_valid_word("zebra")
        assert not lm.is_valid_word("<s>")

    def test_sentence_score_finite(self, arpa_file):
        lm = ArpaLanguageModel.load(arpa_file)
        assert math.isfinite(lm.score_sentence(["the", "cat", "sat"]))


@pytest.mark.skipif(_native is None, reason="native extension unavailable")
class TestNativeArpa:
    def test_matches_python(self, arpa_file):
        py = ArpaLanguageModel.load(arpa_file)
        native = NativeArpaLanguageModel(arpa_file)
        assert native.order == 2
        cases = [([], "the"), (["the"], "cat"), (["the", "cat", "sat"], "dog"),
                 (["the", "cat"], "zebra"), ([], "dog"), (["dog"], "the")]
        for context, word in cases:
            assert native.score_word(context, word) == pytest.approx(
                py.score_word(context, word), abs=1e-5), (context, word)
            assert native.is_valid_word(word) == py.is_valid_word(word)

    def test_loader_prefers_native(self, arpa_file):
        lm = load_language_model(arpa_file.parent)
        assert isinstance(lm, NativeArpaLanguageModel)


class TestBeamFusion:
    def test_lm_steers_decoding(self, arpa_file):
        # Alphabet: a=0..z=25, space=26, '=27, blank=28. Acoustics slightly prefer "dat";
        # the LM strongly prefers "cat" after "the ".
        alphabet = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
        blank = 28
        lm = ArpaLanguageModel.load(arpa_file)

        def frames_for(text, wrong_boost=None):
            frames = []
            for i, ch in enumerate(text):
                row = np.full(29, 1e-6)
                row[alphabet.index(ch)] = 1.0
                if wrong_boost and i in wrong_boost:
                    row[alphabet.index(wrong_boost[i])] = 1.4  # acoustically preferred
                frames.append(np.log(row / row.sum()))
            return np.array(frames)[None]

        # "the cat" with 'c' acoustically ambiguous vs 'd' ("the dat" slightly preferred).
        log_probs = frames_for("the cat", wrong_boost={4: "d"})
        no_lm_tokens, no_lm_counts = beam_search_decode(log_probs, [7], blank, beam_width=8)
        no_lm = "".join(alphabet[i] for i in no_lm_tokens[0, :no_lm_counts[0]])
        assert no_lm == "the dat"

        tokens, counts = beam_search_decode(
            log_probs, [7], blank, beam_width=8, alphabet=alphabet, lm=lm,
            lm_weight=2.0, valid_word_count_weight=2.3)
        fused = "".join(alphabet[i] for i in tokens[0, :counts[0]])
        assert fused == "the cat"
