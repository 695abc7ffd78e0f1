"""Grapheme codec contract tests (ported contracts from reference
`test/test_grapheme_encoding.py`, plus batch-encode/padding pins)."""
import numpy as np
import pytest

from speechless_tpu.text import (AsgGraphemeCodec, CtcGraphemeCodec,
                                 english_frequent_characters, german_frequent_characters)


class TestCtcCodec:
    def test_roundtrip(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        label = "she wasn't three abcxyz"
        assert g.decode_graphemes(g.encode(label), merge_repeated=False) == label

    def test_decode_merges_repeats_and_strips_blank(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        graphemes = g.encode("sssshhhheeeee      wasn't thre") + [g.ctc_blank] + g.encode("eeeeee")
        assert g.decode_graphemes(graphemes) == "she wasn't three"

    def test_blank_is_last_index(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        assert g.ctc_blank == g.grapheme_set_size - 1
        assert g.grapheme_set_size == len(english_frequent_characters) + 1

    def test_decode_prediction_batch(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        predictions = np.zeros((2, 3, g.grapheme_set_size))
        for b in range(2):
            predictions[b, 0, g.encode_character("a")] = 1
            predictions[b, 1, g.encode_character("b")] = 1
            predictions[b, 2, g.encode_character("c")] = 1
        assert g.decode_prediction_batch(predictions, prediction_lengths=[3, 2]) == ["abc", "ab"]

    def test_encode_label_batch_padding(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        batch = g.encode_label_batch(["ab", "a"])
        assert batch.dtype == np.int32
        assert batch.shape == (2, 2)
        assert batch[1, 1] == -1
        assert batch[0, 0] == g.encode_character("a")

    def test_unknown_character_raises(self):
        g = CtcGraphemeCodec(english_frequent_characters)
        with pytest.raises(ValueError):
            g.encode("abc!")
        with pytest.raises(ValueError):
            g.encode("abcä")

    def test_german_charset(self):
        g = CtcGraphemeCodec(german_frequent_characters)
        label = "größe über'm haß"
        assert g.decode_graphemes(g.encode(label), merge_repeated=False) == label


class TestAsgCodec:
    def test_encode_repetitions(self):
        g = AsgGraphemeCodec(english_frequent_characters)
        assert g.encode("ee") == [g.encode_character("e"), g.asg_twice]
        assert g.encode("eee") == [g.encode_character("e"), g.asg_thrice]
        with pytest.raises(ValueError):
            g.encode("eeee")

    def test_decode(self):
        g = AsgGraphemeCodec(english_frequent_characters)
        chars = [g.encode_character(c) for c in "sssshhhheeeee      wasn't thre"]
        graphemes = chars + [g.asg_twice] * 3 + \
            [g.encode_character(c) for c in "    aaaaaaa"] + [g.asg_thrice]
        assert g.decode_graphemes(graphemes) == "she wasn't three aaa"

    def test_specials_are_last_two(self):
        g = AsgGraphemeCodec(english_frequent_characters)
        assert g.asg_twice == g.grapheme_set_size - 2
        assert g.asg_thrice == g.grapheme_set_size - 1


class TestAsgDecodeRobustness:
    def test_leading_or_stacked_specials_do_not_crash(self):
        # Untrained model argmax can emit repetition graphemes anywhere.
        g = AsgGraphemeCodec(english_frequent_characters)
        assert g.decode_graphemes([g.asg_twice, 0]) == "a"
        assert g.decode_graphemes([0, g.asg_thrice, g.asg_twice]) == "aaa"
        assert g.decode_graphemes([g.asg_twice, g.asg_thrice]) == ""
