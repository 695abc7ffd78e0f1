"""Synthetic quality-eval corpus generator (data/synthetic.py)."""
import hashlib
from pathlib import Path

import numpy as np

from speechless_tpu.data.librispeech import LibriSpeechCorpus
from speechless_tpu.data.corpus import TrainingTestSplit
from speechless_tpu.data.synthetic import (_REGISTRY, character_tones, generate_corpus,
                                           sample_sentence, _markov_successors,
                                           synthesize_utterance, DEFAULT_VOCABULARY)
from speechless_tpu.text.charsets import english_frequent_characters, \
    german_frequent_characters


def test_character_tones_are_unique_and_canonical():
    tones = [character_tones(c) for c in _REGISTRY]
    assert len(set(tones)) == len(_REGISTRY)
    assert character_tones("a") == character_tones("a")
    for low, high in tones:
        assert 400 < low < high < 4000  # separable by the mel frontend, below Nyquist


def test_synthesize_utterance_is_deterministic_and_bounded():
    a = synthesize_utterance("it's fine", np.random.RandomState(7))
    b = synthesize_utterance("it's fine", np.random.RandomState(7))
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and np.abs(a).max() <= 0.99
    # ~0.09 s per phone x 9 characters, within jitter bounds
    assert 0.5 * 16000 < len(a) < 1.5 * 16000


def test_sentences_have_markov_structure():
    successors = _markov_successors(DEFAULT_VOCABULARY, branching=4, seed=1)
    rand = np.random.RandomState(0)
    sentences = [sample_sentence(rand, DEFAULT_VOCABULARY, successors, 20)
                 for _ in range(50)]
    bigrams = set()
    total = 0
    for sentence in sentences:
        words = sentence.split()
        bigrams.update(zip(words, words[1:]))
        total += len(words) - 1
    # Branching 4 bounds distinct continuations: far fewer distinct bigrams than tokens.
    assert len(bigrams) < 0.8 * total


def test_generated_corpus_parses_through_librispeech(tmp_path):
    directory = generate_corpus(tmp_path, "synth-test", utterance_count=6,
                                speaker_count=2, min_duration_s=1.0, max_duration_s=2.0,
                                seed=3)
    corpus = LibriSpeechCorpus(
        base_directory=tmp_path, corpus_name="synth-test",
        training_test_split=TrainingTestSplit.randomly(0.5))
    examples = corpus.training_examples + corpus.test_examples
    assert len(examples) == 6
    for example in examples:
        assert example.label
        assert all(c in english_frequent_characters for c in example.label)
    # Reuse: a second call with the same parameters skips regeneration.
    again = generate_corpus(tmp_path, "synth-test", utterance_count=6, speaker_count=2,
                            min_duration_s=1.0, max_duration_s=2.0, seed=3)
    assert again == directory


def test_generation_is_deterministic(tmp_path):
    def digest(root: Path) -> str:
        h = hashlib.sha256()
        for f in sorted(root.rglob("*.wav")) + sorted(root.rglob("*.trans.txt")):
            h.update(f.name.encode())
            h.update(f.read_bytes())
        return h.hexdigest()

    a = generate_corpus(tmp_path / "a", utterance_count=4, speaker_count=2,
                        min_duration_s=1.0, max_duration_s=1.5, seed=11)
    b = generate_corpus(tmp_path / "b", utterance_count=4, speaker_count=2,
                        min_duration_s=1.0, max_duration_s=1.5, seed=11)
    assert digest(a) == digest(b)


def test_german_charset_corpus(tmp_path):
    generate_corpus(tmp_path, "synth-de", utterance_count=4, speaker_count=1,
                    min_duration_s=1.0, max_duration_s=2.0, seed=5,
                    characters=german_frequent_characters)
    corpus = LibriSpeechCorpus(
        base_directory=tmp_path, corpus_name="synth-de",
        allowed_characters=german_frequent_characters,
        training_test_split=TrainingTestSplit.training_only)
    labels = [e.label for e in corpus.training_examples]
    assert len(labels) == 4
    assert all(all(c in german_frequent_characters for c in label) for label in labels)


class TestDifficultyTiers:
    def test_hard_tier_tones_unique_and_tighter(self):
        from speechless_tpu.data.synthetic import DIFFICULTY_TIERS

        hard = [character_tones(c, "hard") for c in _REGISTRY]
        standard = [character_tones(c, "standard") for c in _REGISTRY]
        assert len(set(hard)) == len(_REGISTRY)
        # Hard low-band neighbors sit closer than standard ones (confusability knob).
        hard_gap = hard[1][0] - hard[0][0]
        standard_gap = standard[1][0] - standard[0][0]
        assert 0 < hard_gap < standard_gap
        assert DIFFICULTY_TIERS["hard"]["noise_range"][1] \
            > DIFFICULTY_TIERS["standard"]["noise_range"][1]

    def test_hard_utterance_deterministic_and_noisier(self):
        a = synthesize_utterance("it's fine", np.random.RandomState(7), difficulty="hard")
        b = synthesize_utterance("it's fine", np.random.RandomState(7), difficulty="hard")
        assert np.array_equal(a, b)
        assert a.dtype == np.float32 and np.abs(a).max() <= 0.99
        easy = synthesize_utterance("it's fine", np.random.RandomState(7))
        assert not np.array_equal(a[:len(easy)], easy[:len(a)])

    def test_every_utterance_is_ctc_feasible(self):
        """The hard tier's 0.6x tempo-jitter floor could render audio shorter than its
        own transcript's CTC minimum (len + adjacent repeats frames at stride 2); the
        generator pads the tail with the noise floor up to that minimum."""
        from speechless_tpu.data.synthetic import synthesize_utterance

        rand = np.random.RandomState(7)
        for _ in range(40):
            words = ["follow", "little", "all", "been", "good", "small", "isn't"]
            text = " ".join(words[int(rand.randint(len(words)))] for _ in range(12))
            audio = synthesize_utterance(text, rand, difficulty="hard")
            repeats = sum(1 for a, b in zip(text, text[1:]) if a == b)
            assert len(audio) // 256 >= len(text) + repeats

    def test_tier_example_ids_are_disjoint(self, tmp_path):
        """Standard and hard corpora under one Configuration share a spectrogram cache
        keyed by example id; tier-encoded chapter fields keep the ids disjoint."""
        from speechless_tpu.data.librispeech import LibriSpeechCorpus

        generate_corpus(tmp_path, "std", utterance_count=6, speaker_count=2, seed=0)
        generate_corpus(tmp_path, "hrd", utterance_count=6, speaker_count=2, seed=0,
                        difficulty="hard")
        ids = {}
        for name in ("std", "hrd"):
            corpus = LibriSpeechCorpus(base_directory=tmp_path, corpus_name=name)
            ids[name] = {e.id for e in corpus.examples}
        assert ids["std"] and ids["hrd"]
        assert not (ids["std"] & ids["hrd"])

    def test_hard_corpus_generates_and_reparses(self, tmp_path):
        directory = generate_corpus(tmp_path, "synth-hard", utterance_count=4,
                                    speaker_count=2, min_duration_s=1.0,
                                    max_duration_s=2.0, difficulty="hard", seed=3)
        corpus = LibriSpeechCorpus(base_directory=tmp_path, corpus_name="synth-hard",
                                   training_test_split=TrainingTestSplit.randomly(0.5))
        assert len(corpus.examples) == 4
        # A standard-tier call with otherwise equal parameters must regenerate
        # (signature mismatch), not silently reuse the hard tree.
        marker = (directory / ".complete").read_text()
        assert "hard" in marker
        generate_corpus(tmp_path, "synth-hard", utterance_count=4, speaker_count=2,
                        min_duration_s=1.0, max_duration_s=2.0, seed=3)
        assert (directory / ".complete").read_text() != marker

    def test_confusable_neighbors_grid_geometry(self):
        """Confusion-burst partner geometry: grid-row neighbors share the high tone and
        sit one low-spacing step away; row edges keep one-sided neighbors; the "any"
        partner pool (synthesize_utterance) excludes self and neighbors by design."""
        from speechless_tpu.data.synthetic import _confusable_neighbors

        assert _confusable_neighbors(0) == [1]          # row start: right only
        assert _confusable_neighbors(6) == [5]          # row end: left only
        assert _confusable_neighbors(10) == [9, 11]     # row middle: both sides
        for index in range(len(_REGISTRY)):
            neighbors = _confusable_neighbors(index)
            assert neighbors and index not in neighbors
            for other in neighbors:
                low_a, high_a = character_tones(_REGISTRY[index], "hard")
                low_b, high_b = character_tones(_REGISTRY[other], "hard")
                # Same high row -> one low step; row-edge fallback -> one high step.
                assert (high_a == high_b and abs(low_a - low_b) < 66.0) \
                    or (low_a == low_b and abs(high_a - high_b) < 171.0)

    def test_confusion_bursts_change_audio_only_on_gated_utterances(self):
        """The per-utterance confusion gate consumes one rand draw up front, so with
        equal seeds a hard utterance differs from a burst-free variant only when the
        gate fires and a phone draw lands under phone_confusion_prob."""
        from speechless_tpu.data.synthetic import DIFFICULTY_TIERS

        tier = DIFFICULTY_TIERS["hard"]
        assert 0.0 < tier["utterance_confusion_prob"] <= 1.0
        assert 0.0 < tier["phone_confusion_prob"] < 0.5   # sparse-within-words regime
        lo, hi = tier["phone_confusion_mix"]
        assert 0.0 < lo <= hi < 1.0
        audio = [synthesize_utterance("they went home", np.random.RandomState(s),
                                      difficulty="hard") for s in range(24)]
        assert all(np.isfinite(a).all() for a in audio)
