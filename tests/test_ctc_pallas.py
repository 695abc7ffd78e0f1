"""Pallas CTC kernel parity vs the lax.scan implementation (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from speechless_tpu.ops.ctc import ctc_loss
from speechless_tpu.ops.ctc_pallas import ctc_loss_pallas

from test_ctc import random_case


class TestPallasParity:
    def test_loss_matches_scan(self, rng):
        for _ in range(3):
            log_probs, logit_lengths, labels, label_lengths, blank = random_case(
                rng, batch=4, t_max=12, u_max=4, classes=6)
            args = (jnp.asarray(log_probs, jnp.float32), jnp.asarray(logit_lengths),
                    jnp.asarray(labels), jnp.asarray(label_lengths))
            expected = np.asarray(ctc_loss(*args, blank))
            actual = np.asarray(ctc_loss_pallas(*args, blank))
            np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)

    def test_grad_matches_scan(self, rng):
        log_probs, logit_lengths, labels, label_lengths, blank = random_case(
            rng, batch=3, t_max=10, u_max=3, classes=5)
        args = (jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths))
        lp = jnp.asarray(log_probs, jnp.float32)
        expected = np.asarray(jax.grad(
            lambda x: jnp.sum(ctc_loss(x, *args, blank)))(lp))
        actual = np.asarray(jax.grad(
            lambda x: jnp.sum(ctc_loss_pallas(x, *args, blank)))(lp))
        np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-5)

    def test_non_aligned_batch(self, rng):
        # batch=5 exercises sublane padding; u_max large enough to cross a lane boundary.
        log_probs, logit_lengths, labels, label_lengths, blank = random_case(
            rng, batch=5, t_max=140, u_max=65, classes=7)
        args = (jnp.asarray(log_probs, jnp.float32), jnp.asarray(logit_lengths),
                jnp.asarray(labels), jnp.asarray(label_lengths))
        expected = np.asarray(ctc_loss(*args, blank))
        actual = np.asarray(ctc_loss_pallas(*args, blank))
        np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-4)
