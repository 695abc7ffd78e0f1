"""Edit distance + result aggregation tests (extends reference `test/test_net.py`)."""
import math

from speechless_tpu.text import (ExpectationsVsPredictions, ExpectationsVsPredictionsInBatches,
                                 ExpectationsVsPredictionsInGroupedBatches,
                                 ExpectationVsPrediction, levenshtein)
from speechless_tpu.text.metrics import _levenshtein_python


class TestLevenshtein:
    cases = [
        ("", "", 0), ("abc", "", 3), ("", "abc", 3), ("abc", "abc", 0),
        ("kitten", "sitting", 3), ("flaw", "lawn", 2), ("saturday", "sunday", 3),
        ("größe", "grosse", 3),
    ]

    def test_known_distances(self):
        for a, b, expected in self.cases:
            assert levenshtein(a, b) == expected, (a, b)
            assert _levenshtein_python(a, b) == expected, (a, b)

    def test_word_sequences(self):
        assert levenshtein(["the", "cat"], ["the", "dog"]) == 1
        assert levenshtein("the cat sat".split(), "a cat sat down".split()) == 2
        assert levenshtein([], ["x"]) == 1

    def test_native_matches_python(self, rng):
        alphabet = "ab cd"
        for _ in range(50):
            a = "".join(rng.choice(list(alphabet), rng.randint(0, 30)))
            b = "".join(rng.choice(list(alphabet), rng.randint(0, 30)))
            assert levenshtein(a, b) == _levenshtein_python(a, b), (a, b)


class TestAggregation:
    def test_single_result(self):
        r = ExpectationVsPrediction(expected="hello world", predicted="hallo world", loss=1.5)
        assert r.letter_error_count == 1
        assert r.word_error_count == 1
        assert r.letter_error_rate == 1 / 11
        assert r.word_error_rate == 1 / 2
        assert "hallo" in str(r)

    def test_empty_aggregates_are_nan(self):
        empty = ExpectationsVsPredictions([])
        assert math.isnan(empty.average_letter_error_rate)
        assert math.isnan(empty.average_loss)

    def test_grouped_structure(self):
        a = ExpectationVsPrediction(expected="A", predicted="A", loss=0.0)
        b = ExpectationVsPrediction(expected="B", predicted="A", loss=2.0)
        batches = ExpectationsVsPredictionsInBatches(
            [ExpectationsVsPredictions([a, b]), ExpectationsVsPredictions([])])
        grouped = ExpectationsVsPredictionsInGroupedBatches({
            "corpus1": batches, "corpus2": batches,
            "empty": ExpectationsVsPredictionsInBatches([])})
        assert len(grouped.results) == 4
        assert grouped.average_loss == 1.0
        str(grouped)  # formatting must not raise, incl. empty groups
