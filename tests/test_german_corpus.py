"""German corpus parser tests: umlaut decoding, .par/TR2 merging, positional _annot.json,
ALC label repair, Voxforge XML + per-microphone fan-out, tag stripping."""
import json

import pytest

from speechless_tpu.data import TrainingTestSplit
from speechless_tpu.data.german import (GermanClarinCorpus, GermanVoxforgeCorpus,
                                        UmlautDecoder, german_frequent_characters,
                                        vm1_id_german_filter_regex, vm2_id_german_filter_regex)
from speechless_tpu.features import PositionalLabel

from conftest import make_test_wav


class TestUmlautDecoder:
    def test_quote_before(self):
        assert UmlautDecoder.quote_before_umlaut('gr\\"o\\"se') == "größe"
        assert UmlautDecoder.quote_before_umlaut('"a"o"u"s') == "äöüß"
        assert UmlautDecoder.quote_before_umlaut('\\"a') == "ä"

    def test_quote_after(self):
        assert UmlautDecoder.quote_after_umlaut('a"o"u"s"') == "äöüß"
        assert UmlautDecoder.quote_after_umlaut('a\\"') == "ä"

    def test_try_both(self):
        assert UmlautDecoder.try_quote_before_umlaut_then_after('"aa"') == "ää"

    def test_none(self):
        assert UmlautDecoder.none('"a') == '"a'


class TestIdFilters:
    def test_vm1(self):
        assert vm1_id_german_filter_regex.match("k_something")
        assert not vm1_id_german_filter_regex.match("y_japanese")

    def test_vm2(self):
        assert vm2_id_german_filter_regex.match("g123")
        assert vm2_id_german_filter_regex.match("m123_GER")
        assert not vm2_id_german_filter_regex.match("e123")


def make_clarin_tree(base, corpus_name, utterances, par_extra=None):
    """Synthetic Clarin layout (subdirectory_depth=2): base/<name>/block/session/files."""
    session = base / corpus_name / "block0" / "ses0"
    session.mkdir(parents=True)
    for stem, words in utterances.items():
        make_test_wav(session / (stem + ".wav"), duration_s=1.0)
        lines = ["LHD: Partitur 1.3", "ORT: 0\t" + "\nORT: 1\t".join(words)]
        if par_extra and stem in par_extra:
            lines += par_extra[stem]
        # One ORT line per word, tab-separated (BAS Partitur convention).
        ort_lines = ["ORT:\t{}\t{}".format(i, w) for i, w in enumerate(words)]
        (session / (stem + ".par")).write_text("\n".join(ort_lines), encoding="utf8")
    return session


class TestClarinParParsing:
    def test_par_labels_and_umlauts(self, tmp_path):
        make_clarin_tree(tmp_path, "corpus-a", {"rec1": ['gr\\"o\\"se', "test"],
                                                "rec2": ["hallo", "welt"]})
        corpus = GermanClarinCorpus(
            "corpus-a", tmp_path, base_source_url_or_directory=str(tmp_path) + "/",
            training_test_split=TrainingTestSplit.training_only)
        labels = sorted(e.label for e in corpus.examples)
        assert labels == ["größe test", "hallo welt"]
        for e in corpus.examples:
            assert all(c in german_frequent_characters for c in e.label), e.label

    def test_tr2_merge_repairs_truncation(self, tmp_path):
        session = tmp_path / "corpus-b" / "block0" / "ses0"
        session.mkdir(parents=True)
        make_test_wav(session / "rec1.wav", duration_s=1.0)
        (session / "rec1.par").write_text(
            "ORT:\t0\t<usb>\nORT:\t1\twelt\nTR2:\t0\tsomethi~\nTR2:\t1\twelt",
            encoding="utf8")
        corpus = GermanClarinCorpus(
            "corpus-b", tmp_path, base_source_url_or_directory=str(tmp_path) + "/",
            training_test_split=TrainingTestSplit.training_only)
        assert [e.label for e in corpus.examples] == ["somethi welt"]  # "~" is a stripped tag

    def test_alc_repair_copies_h_to_m(self, tmp_path):
        make_clarin_tree(tmp_path, "all.ALC.fake",
                         {"0061006007_h_00": ["ein", "satz"], "0061006007_m_00": []})
        corpus = GermanClarinCorpus(
            "all.ALC.fake", tmp_path, base_source_url_or_directory=str(tmp_path) + "/",
            training_test_split=TrainingTestSplit.training_only)
        labels = {e.id: e.label for e in corpus.examples}
        assert labels["0061006007_m_00"] == "ein satz"
        assert labels["0061006007_h_00"] == "ein satz"


def make_annot_json(words_with_ranges):
    """EMU _annot.json with an ORT word level linked to MAU segments."""
    items = [{"id": i + 1, "labels": [{"name": "ORT", "value": w}]}
             for i, (w, _) in enumerate(words_with_ranges)]
    segments = [{"id": 100 + i, "sampleStart": r[0], "sampleDur": r[1] - r[0] - 1,
                 "labels": [{"name": "MAU", "value": "phon"}]}
                for i, (_, r) in enumerate(words_with_ranges)]
    links = [{"fromID": i + 1, "toID": 100 + i} for i in range(len(words_with_ranges))]
    return json.dumps({
        "levels": [
            {"name": "ORT", "type": "ITEM", "items": items},
            {"name": "MAU", "type": "SEGMENT", "items": segments},
        ],
        "links": links,
    })


class TestClarinJsonParsing:
    def test_positional_label_from_json(self, tmp_path):
        session = tmp_path / "corpus-c" / "block0" / "ses0"
        session.mkdir(parents=True)
        make_test_wav(session / "rec1.wav", duration_s=1.0)
        (session / "rec1_annot.json").write_text(
            make_annot_json([("hallo", (0, 8000)), ("welt", (8000, 16000))]),
            encoding="utf8")
        corpus = GermanClarinCorpus(
            "corpus-c", tmp_path, base_source_url_or_directory=str(tmp_path) + "/",
            training_test_split=TrainingTestSplit.training_only)
        example = corpus.examples[0]
        assert example.label == "hallo welt"
        assert example.positional_label is not None
        (word, (start, end)) = example.positional_label.labeled_sections[0]
        assert word == "hallo"
        assert start == 0.0 and end == pytest.approx(0.5)  # samples -> seconds @16k
        sections = example.sections()
        assert len(sections) == 2
        assert sections[1].label == "welt"

    def test_json_overrides_par(self, tmp_path):
        session = tmp_path / "corpus-d" / "block0" / "ses0"
        session.mkdir(parents=True)
        make_test_wav(session / "rec1.wav", duration_s=1.0)
        (session / "rec1.par").write_text("ORT:\t0\tpar version", encoding="utf8")
        (session / "rec1_annot.json").write_text(
            make_annot_json([("json", (0, 8000)), ("version", (8000, 16000))]),
            encoding="utf8")
        corpus = GermanClarinCorpus(
            "corpus-d", tmp_path, base_source_url_or_directory=str(tmp_path) + "/",
            training_test_split=TrainingTestSplit.training_only)
        assert corpus.examples[0].label == "json version"


class TestVoxforge:
    def test_xml_and_microphone_fanout(self, tmp_path):
        corpus_dir = tmp_path / "german-speechdata-package-v2" / "train"
        corpus_dir.mkdir(parents=True)
        stem = "2015-01-01-10-00-00"
        (corpus_dir / (stem + ".xml")).write_text(
            "<recording><cleaned_sentence>Häuser in Constanța</cleaned_sentence></recording>",
            encoding="utf8")
        for mic in ["_Yamaha", "_Realtek"]:
            make_test_wav(corpus_dir / (stem + mic + ".wav"), duration_s=1.0)
        corpus = GermanVoxforgeCorpus(base_directory=tmp_path)
        ids = sorted(e.id for e in corpus.examples)
        assert ids == [stem + "_Realtek", stem + "_Yamaha"]
        # 'ț' folded to 't', lowercased; train dir -> training split
        assert corpus.examples[0].label == "häuser in constanta"
        assert len(corpus.training_examples) == 2
