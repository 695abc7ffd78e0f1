"""CTC loss parity tests: value and gradient vs torch.nn.functional.ctc_loss (CPU),
plus hand-computable cases and variable-length masking pins."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from speechless_tpu.ops.ctc import ctc_loss, ctc_loss_from_logits


def torch_ctc(log_probs, logit_lengths, labels, label_lengths, blank):
    """(B,T,C) numpy log-probs -> per-example torch CTC loss + grad wrt log_probs."""
    lp = torch.tensor(np.transpose(log_probs, (1, 0, 2)), dtype=torch.float64,
                      requires_grad=True)
    targets = torch.tensor(np.concatenate([row[:n] for row, n in zip(labels, label_lengths)]),
                           dtype=torch.long)
    loss = F.ctc_loss(lp, targets,
                      torch.tensor(logit_lengths, dtype=torch.long),
                      torch.tensor(label_lengths, dtype=torch.long),
                      blank=blank, reduction="none", zero_infinity=False)
    loss.sum().backward()
    grad = np.transpose(lp.grad.numpy(), (1, 0, 2))
    return loss.detach().numpy(), grad


def random_case(rng, batch=4, t_max=20, u_max=6, classes=7):
    blank = classes - 1
    logits = rng.randn(batch, t_max, classes).astype(np.float64)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    label_lengths = rng.randint(1, u_max + 1, size=batch)
    logit_lengths = np.array([rng.randint(2 * label_lengths[i] + 1, t_max + 1)
                              for i in range(batch)])
    labels = -np.ones((batch, u_max), dtype=np.int32)
    for i in range(batch):
        labels[i, :label_lengths[i]] = rng.randint(0, classes - 1, size=label_lengths[i])
    return log_probs, logit_lengths, labels, label_lengths, blank


class TestCtcLossParity:
    def test_values_match_torch(self, rng):
        for _ in range(5):
            log_probs, logit_lengths, labels, label_lengths, blank = random_case(rng)
            expected, _ = torch_ctc(log_probs, logit_lengths, labels, label_lengths, blank)
            actual = np.asarray(ctc_loss(
                jnp.asarray(log_probs, dtype=jnp.float32), jnp.asarray(logit_lengths),
                jnp.asarray(labels), jnp.asarray(label_lengths), blank))
            np.testing.assert_allclose(actual, expected, rtol=2e-4, atol=2e-4)

    def test_grads_match_torch(self, rng):
        # torch's reported CTC gradient is w.r.t. pre-softmax logits (softmax - occupancy),
        # so the apples-to-apples comparison is d/d(logits) of our from-logits entry point.
        logits = rng.randn(3, 20, 7)
        log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        _, logit_lengths, labels, label_lengths, blank = random_case(rng, batch=3)
        _, expected_grad = torch_ctc(log_probs, logit_lengths, labels, label_lengths, blank)

        grad_fn = jax.grad(lambda lg: jnp.sum(ctc_loss_from_logits(
            lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
            jnp.asarray(label_lengths), blank)))
        actual_grad = np.asarray(grad_fn(jnp.asarray(logits, dtype=jnp.float32)))
        np.testing.assert_allclose(actual_grad, expected_grad, rtol=1e-3, atol=1e-4)

    def test_custom_vjp_matches_autodiff(self, rng):
        # The custom alpha-beta backward must equal autodiff through the forward scan.
        from speechless_tpu.ops import ctc as C
        log_probs, logit_lengths, labels, label_lengths, blank = random_case(rng, batch=3)

        def loss_plain(lp):
            ext, skip = C._extended_labels(jnp.asarray(labels), blank)
            final, _ = C._forward(lp, jnp.asarray(logit_lengths), ext, skip,
                                  2 * jnp.asarray(label_lengths) + 1)
            return -jnp.sum(final)

        auto = np.asarray(jax.grad(loss_plain)(jnp.asarray(log_probs, dtype=jnp.float32)))
        custom = np.asarray(jax.grad(lambda lp: jnp.sum(ctc_loss(
            lp, jnp.asarray(logit_lengths), jnp.asarray(labels),
            jnp.asarray(label_lengths), blank)))(jnp.asarray(log_probs, dtype=jnp.float32)))
        np.testing.assert_allclose(custom, auto, rtol=1e-4, atol=1e-5)

    def test_repeated_characters(self, rng):
        # "aa" requires a blank between repeats — exercises the skip-forbidden transition.
        classes, blank = 3, 2
        logits = rng.randn(2, 8, classes)
        log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        labels = np.array([[0, 0, -1], [0, 1, 0]], dtype=np.int32)
        label_lengths = np.array([2, 3])
        logit_lengths = np.array([8, 7])
        expected, expected_grad = torch_ctc(log_probs, logit_lengths, labels, label_lengths, blank)
        actual = np.asarray(ctc_loss(jnp.asarray(log_probs, dtype=jnp.float32),
                                     jnp.asarray(logit_lengths), jnp.asarray(labels),
                                     jnp.asarray(label_lengths), blank))
        np.testing.assert_allclose(actual, expected, rtol=2e-4, atol=2e-4)
        grad = np.asarray(jax.grad(lambda lg: jnp.sum(ctc_loss_from_logits(
            lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
            jnp.asarray(label_lengths), blank)))(jnp.asarray(logits, dtype=jnp.float32)))
        np.testing.assert_allclose(grad, expected_grad, rtol=1e-3, atol=1e-4)

    def test_hand_case_single_step(self):
        # T=1, label "a": only path is emitting 'a' -> loss = -log p(a).
        p = np.log(np.array([[[0.6, 0.1, 0.3]]]))
        loss = np.asarray(ctc_loss(jnp.asarray(p, dtype=jnp.float32), jnp.asarray([1]),
                                   jnp.asarray([[0]], dtype=jnp.int32), jnp.asarray([1]), 2))
        np.testing.assert_allclose(loss, [-np.log(0.6)], rtol=1e-5)

    def test_padding_does_not_affect_loss(self, rng):
        log_probs, logit_lengths, labels, label_lengths, blank = random_case(rng, batch=2)
        base = np.asarray(ctc_loss(jnp.asarray(log_probs, dtype=jnp.float32),
                                   jnp.asarray(logit_lengths), jnp.asarray(labels),
                                   jnp.asarray(label_lengths), blank))
        # Extend time and label padding with garbage; loss must be identical.
        t_pad = rng.randn(2, 5, log_probs.shape[2])
        padded_lp = np.concatenate([log_probs, t_pad], axis=1)
        padded_labels = np.concatenate([labels, -np.ones((2, 3), np.int32)], axis=1)
        padded = np.asarray(ctc_loss(jnp.asarray(padded_lp, dtype=jnp.float32),
                                     jnp.asarray(logit_lengths), jnp.asarray(padded_labels),
                                     jnp.asarray(label_lengths), blank))
        np.testing.assert_allclose(padded, base, rtol=1e-5)

    def test_from_logits_matches_log_softmax_path(self, rng):
        logits = rng.randn(2, 10, 5).astype(np.float32)
        labels = np.array([[0, 1], [2, 3]], dtype=np.int32)
        lengths = np.array([10, 9])
        label_lengths = np.array([2, 2])
        a = np.asarray(ctc_loss_from_logits(jnp.asarray(logits), jnp.asarray(lengths),
                                            jnp.asarray(labels), jnp.asarray(label_lengths), 4))
        b = np.asarray(ctc_loss(jax.nn.log_softmax(jnp.asarray(logits), axis=-1),
                                jnp.asarray(lengths), jnp.asarray(labels),
                                jnp.asarray(label_lengths), 4))
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_impossible_label_is_large(self):
        # Label longer than input frames -> probability ~0 -> loss ~ NEG_INF magnitude.
        p = np.log(np.full((1, 2, 3), 1 / 3))
        loss = np.asarray(ctc_loss(jnp.asarray(p, dtype=jnp.float32), jnp.asarray([2]),
                                   jnp.asarray([[0, 0, 0]], dtype=np.int32), jnp.asarray([3]), 2))
        assert loss[0] > 1e20
