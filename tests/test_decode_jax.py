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
