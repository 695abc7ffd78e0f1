"""CTC forced alignment (ops/forced_align.py).

Contract: `ctc_forced_align` returns the MAXIMUM-score path through the transcript's
CTC lattice (stay / advance / skip-a-blank between distinct labels) and each label's
frame span along it — pinned against brute-force enumeration of every legal alignment
path on small shapes, plus the obvious-alignment and padding/infeasibility edges.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from speechless_tpu.ops.forced_align import (ctc_forced_align,
                                             word_spans_from_alignment)
from speechless_tpu.text.graphemes import CtcGraphemeCodec

BLANK = 4  # classes 0..3 are labels


def brute_force(lp, length, lab):
    """Enumerate every legal CTC alignment path; return (best score, per-label spans)."""
    s_count = 2 * len(lab) + 1
    state_char = [BLANK if s % 2 == 0 else lab[s // 2] for s in range(s_count)]
    best = [-np.inf, None]

    def rec(t, s, score, path):
        score = score + lp[t, state_char[s]]
        path = path + [s]
        if t == length - 1:
            if s >= s_count - 2 and score > best[0]:
                best[0], best[1] = score, path
            return
        for s2 in (s, s + 1, s + 2):
            if s2 >= s_count:
                continue
            if s2 == s + 2 and (s2 % 2 == 0 or state_char[s2] == state_char[s]):
                continue
            rec(t + 1, s2, score, path)

    for s0 in range(min(2, s_count)):
        rec(0, s0, 0.0, [])
    spans = []
    for k in range(len(lab)):
        frames = [t for t, s in enumerate(best[1]) if s == 2 * k + 1]
        spans.append((min(frames), max(frames) + 1))
    return best[0], spans


def run_align(lp, length, lab, u_pad=None):
    u_pad = u_pad or len(lab)
    labels = np.full((1, u_pad), -1, np.int32)
    labels[0, : len(lab)] = lab
    starts, ends, scores = ctc_forced_align(
        jnp.asarray(lp[None]), jnp.asarray([length]), jnp.asarray(labels),
        jnp.asarray([len(lab)]), blank=BLANK)
    return np.asarray(starts)[0], np.asarray(ends)[0], float(scores[0])


class TestBruteForceParity:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_enumeration(self, seed):
        rng = np.random.RandomState(seed)
        t, lab = 7, [int(c) for c in rng.randint(0, 4, size=3)]
        lp = np.log(rng.dirichlet(np.ones(5), size=t)).astype(np.float32)
        expected_score, expected_spans = brute_force(lp, t, lab)
        starts, ends, score = run_align(lp, t, lab, u_pad=5)
        assert score == pytest.approx(expected_score, rel=1e-5)
        for k, (s, e) in enumerate(expected_spans):
            assert (starts[k], ends[k]) == (s, e)
        assert list(starts[3:]) == [-1, -1] and list(ends[3:]) == [-1, -1]

    def test_repeated_label_needs_blank(self):
        # "aa" in 3 frames forces a-blank-a: spans [0,1) and [2,3).
        lp = np.full((3, 5), -10.0, np.float32)
        lp[0, 0] = lp[2, 0] = -0.1   # 'a' peaks at frames 0 and 2
        lp[1, BLANK] = -0.1
        starts, ends, score = run_align(lp, 3, [0, 0])
        assert list(starts) == [0, 2] and list(ends) == [1, 3]
        expected_score, _ = brute_force(lp, 3, [0, 0])
        assert score == pytest.approx(expected_score, rel=1e-5)


class TestEdges:
    def test_obvious_alignment_spans(self):
        # Peaky frames: a a _ b -> 'a' spans [0,2), 'b' spans [3,4).
        lp = np.full((4, 5), -12.0, np.float32)
        lp[0, 0] = lp[1, 0] = -0.05
        lp[2, BLANK] = -0.05
        lp[3, 1] = -0.05
        starts, ends, _ = run_align(lp, 4, [0, 1])
        assert list(starts) == [0, 3] and list(ends) == [2, 4]

    def test_frame_padding_ignored(self):
        rng = np.random.RandomState(1)
        lp = np.log(rng.dirichlet(np.ones(5), size=6)).astype(np.float32)
        full = run_align(lp, 4, [2, 1])
        padded = run_align(np.concatenate([lp[:4], np.zeros((2, 5), np.float32)]),
                           4, [2, 1])
        assert full[2] == pytest.approx(padded[2])
        assert list(full[0]) == list(padded[0]) and list(full[1]) == list(padded[1])

    def test_infeasible_label_flagged_by_score(self):
        lp = np.full((2, 5), -1.0, np.float32)
        _, _, score = run_align(lp, 2, [0, 1, 2])  # 3 labels in 2 frames
        assert score <= -1e29

    def test_empty_label_all_blank(self):
        lp = np.log(np.full((3, 5), 0.2, np.float32))
        starts, ends, score = run_align(lp, 3, [], u_pad=2)
        assert list(starts) == [-1, -1] and list(ends) == [-1, -1]
        assert score == pytest.approx(3 * np.log(0.2), rel=1e-5)


class TestServingSurface:
    ALPHABET = list(" 'abcdefghijklmnopqrstuvwxyz")

    def _transcriber(self, seed=1):
        import jax
        from speechless_tpu.models import wav2letter as w2l
        from speechless_tpu.serving import Transcriber

        layers = (
            w2l.ConvSpec("striding_conv", 8, 48, 2, "relu", False),
            w2l.ConvSpec("inner_conv_1", 8, 7, 1, "relu", False),
            w2l.ConvSpec("big_conv_1", 16, 32, 1, "relu", False),
            w2l.ConvSpec("big_conv_2", 16, 1, 1, "relu", False),
            w2l.ConvSpec("output_conv", len(self.ALPHABET) + 1, 1, 1, "linear",
                         False),
        )
        config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                                      grapheme_set_size=len(self.ALPHABET) + 1,
                                      layers=layers)
        params = w2l.init_params(config, jax.random.PRNGKey(seed))
        return Transcriber(config, params, self.ALPHABET, sample_buckets=(32768,))

    def test_align_audio_words_cover_transcript_in_order(self):
        transcriber = self._transcriber()
        audio = (np.random.RandomState(3).randn(24000) * 0.3).astype(np.float32)
        # Align the model's OWN greedy transcript — always feasible, and the word
        # strings must round-trip exactly with monotone non-overlapping spans.
        transcript = transcriber.transcribe_audio(audio)
        if not transcript.strip():
            pytest.skip("random model decoded to silence for this seed")
        words = transcriber.align_audio(audio, transcript)
        assert [w["word"] for w in words] == [w for w in transcript.split(" ") if w]
        duration = len(audio) / 16000.0
        last_end = 0.0
        for w in words:
            assert 0.0 <= w["start_s"] < w["end_s"] <= duration + 0.5
            assert w["start_s"] >= last_end - 1e-9
            last_end = w["start_s"]

    def test_align_audio_rejects_infeasible_transcript(self):
        transcriber = self._transcriber()
        audio = np.zeros(4000, np.float32)  # ~15 output frames
        with pytest.raises(ValueError, match="cannot be aligned"):
            transcriber.align_audio(audio, "a" * 200)

    def test_align_audio_empty_transcript(self):
        transcriber = self._transcriber()
        assert transcriber.align_audio(np.zeros(8000, np.float32), "  ") == []

    def test_align_audio_normalizes_out_of_alphabet_characters(self):
        # External transcripts carry punctuation/digits; alignment must strip them
        # (word-boundary preserving) instead of raising from inside the codec.
        transcriber = self._transcriber()
        audio = (np.random.RandomState(3).randn(24000) * 0.3).astype(np.float32)
        transcript = transcriber.transcribe_audio(audio)
        if not transcript.strip() or " " in (transcript[0], transcript[-1]):
            pytest.skip("random model decoded to silence/edge-space for this seed")
        dirty = transcript.replace(" ", ", ", 1) + "!!"
        words = transcriber.align_audio(audio, dirty.upper())
        assert [w["word"] for w in words] == [w for w in transcript.split(" ") if w]

    def test_align_audio_all_out_of_alphabet_raises_clear_error(self):
        transcriber = self._transcriber()
        with pytest.raises(ValueError, match="no characters in the model alphabet"):
            transcriber.align_audio(np.zeros(8000, np.float32), "1234?!")


class TestWordSpans:
    def test_words_fold_on_space(self):
        codec = CtcGraphemeCodec(list("ab "))
        tokens = [0, 1, 2, 1, 0]           # "ab ba"
        starts = [0, 2, 4, 5, 7]
        ends = [2, 3, 5, 7, 9]
        words = word_spans_from_alignment(codec, tokens, starts, ends,
                                          seconds_per_frame=0.5)
        assert words == [{"word": "ab", "start_s": 0.0, "end_s": 1.5},
                         {"word": "ba", "start_s": 2.5, "end_s": 4.5}]
