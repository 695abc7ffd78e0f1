"""On-device beam search parity vs the host prefix beam search."""
import jax.numpy as jnp
import numpy as np

from speechless_tpu.ops.decode import beam_search_decode
from speechless_tpu.ops.decode_jax import beam_search_decode_jax

from test_decode import aa_blank_aa_log_probs


class TestOnDeviceBeamSearch:
    def test_aa_blank_aa_contract(self):
        tokens, counts = beam_search_decode_jax(jnp.asarray(aa_blank_aa_log_probs()),
                                                jnp.asarray([5]), blank=1, beam_width=4,
                                                max_decoded_length=8)
        assert int(counts[0]) == 2
        assert list(np.asarray(tokens[0, :2])) == [0, 0]

    def test_path_summing(self):
        probs = np.array([[[0.4, 0.6], [0.4, 0.6]]])
        tokens, counts = beam_search_decode_jax(jnp.asarray(np.log(probs)), jnp.asarray([2]),
                                                blank=1, beam_width=4, max_decoded_length=4)
        assert int(counts[0]) == 1 and int(tokens[0, 0]) == 0

    def test_matches_host_beam_search(self, rng):
        batch, t, classes = 3, 20, 6
        blank = classes - 1
        logits = rng.randn(batch, t, classes) * 2.0
        log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        lengths = np.array([20, 15, 9])
        host_tokens, host_counts = beam_search_decode(log_probs, lengths, blank=blank,
                                                      beam_width=8)
        dev_tokens, dev_counts = beam_search_decode_jax(
            jnp.asarray(log_probs, jnp.float32), jnp.asarray(lengths), blank=blank,
            beam_width=8, max_decoded_length=32)
        for b in range(batch):
            assert int(dev_counts[b]) == int(host_counts[b]), b
            np.testing.assert_array_equal(np.asarray(dev_tokens[b, :dev_counts[b]]),
                                          host_tokens[b, :host_counts[b]])

    def test_respects_lengths_and_padding(self, rng):
        log_probs = np.log(np.full((1, 6, 3), 1e-3))
        log_probs[0, :, 0] = np.log(0.998)  # "aaaaaa" -> "a"
        tokens, counts = beam_search_decode_jax(jnp.asarray(log_probs, jnp.float32),
                                                jnp.asarray([6]), blank=2, beam_width=4,
                                                max_decoded_length=8)
        assert int(counts[0]) == 1
        assert list(np.asarray(tokens[0])) == [0, -1, -1, -1, -1, -1, -1, -1]


class TestCharLmFusion:
    def test_lm_steers_ambiguous_decoding(self):
        from speechless_tpu.lm.char_ngram import char_ngram_table_from_texts
        alphabet = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
        blank = 28
        # LM trained heavily on "the cat" phrases.
        table = jnp.asarray(char_ngram_table_from_texts(
            ["the cat " * 200], alphabet, order=3, add_k=0.01))

        frames = []
        for i, ch in enumerate("the cat"):
            row = np.full(29, 1e-6)
            row[alphabet.index(ch)] = 1.0
            if i == 4:  # make 'c' acoustically lose to 'd'
                row[alphabet.index("d")] = 1.4
            frames.append(np.log(row / row.sum()))
        log_probs = jnp.asarray(np.array(frames)[None], jnp.float32)

        no_lm_tokens, no_lm_counts = beam_search_decode_jax(
            log_probs, jnp.asarray([7]), blank=blank, beam_width=8, max_decoded_length=16)
        no_lm = "".join(alphabet[i] for i in np.asarray(
            no_lm_tokens[0, :no_lm_counts[0]]))
        assert no_lm == "the dat"

        tokens, counts = beam_search_decode_jax(
            log_probs, jnp.asarray([7]), blank=blank, beam_width=8, max_decoded_length=16,
            lm_table=table, lm_weight=1.0)
        fused = "".join(alphabet[i] for i in np.asarray(tokens[0, :counts[0]]))
        assert fused == "the cat"

    def test_zero_weight_matches_no_lm(self, rng):
        from speechless_tpu.lm.char_ngram import char_ngram_table_from_texts
        alphabet = ["a", "b", "c"]
        table = jnp.asarray(char_ngram_table_from_texts(["abcab"], alphabet, order=2))
        logits = rng.randn(2, 12, 4) * 2.0
        log_probs = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)),
                                jnp.float32)
        lengths = jnp.asarray([12, 9])
        base = beam_search_decode_jax(log_probs, lengths, blank=3, beam_width=6,
                                      max_decoded_length=16)
        fused = beam_search_decode_jax(log_probs, lengths, blank=3, beam_width=6,
                                       max_decoded_length=16, lm_table=table, lm_weight=0.0)
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(fused[0]))
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(fused[1]))

    def test_table_builder_normalized(self):
        from speechless_tpu.lm.char_ngram import char_ngram_table_from_texts
        table = char_ngram_table_from_texts(["abab", "ba"], ["a", "b"], order=3)
        assert table.shape == (9, 2)  # base = alphabet + BOS
        np.testing.assert_allclose((10.0 ** table).sum(axis=1), 1.0, rtol=1e-6)

    def test_start_context_distinct_from_char_context(self):
        from speechless_tpu.lm.char_ngram import (char_ngram_table_from_texts,
                                                  initial_context)
        # Trained on "ab" repeated: P(a|start) is high, P(a|'aa' context) should come from
        # smoothing only (never observed) — start-of-text must not pollute real contexts.
        table = char_ngram_table_from_texts(["ab"] * 50, ["a", "b"], order=2)
        start = initial_context(2, 2)
        assert 10.0 ** table[start, 0] > 0.9          # P(a | BOS) high
        assert 10.0 ** table[0, 0] < 0.1              # P(a | 'a') trained low (always 'b')
        assert abs(10.0 ** table[1, 0] - 0.5) < 0.05  # context 'b' untrained -> uniform
