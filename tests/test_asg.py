"""ASG criterion tests: brute-force enumeration parity on tiny cases, masking pins,
gradient flow (the reference stubs ASG entirely; this implements it)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from speechless_tpu.ops.asg import (asg_loss, default_asg_initial_probabilities,
                                    default_asg_transition_probabilities)


def brute_force_asg(emissions, length, labels, trans_log, init_log):
    """Enumerate all paths (free) and all monotone alignments (constrained) directly."""
    t_max, classes = emissions.shape[:2]
    emissions = emissions[:length]

    def path_score(path):
        score = init_log[path[0]] + emissions[0, path[0]]
        for t in range(1, len(path)):
            score += trans_log[path[t], path[t - 1]] + emissions[t, path[t]]
        return score

    free_scores = [path_score(p) for p in itertools.product(range(classes), repeat=length)]

    constrained_scores = []
    for path in itertools.product(range(len(labels)), repeat=length):
        # monotone, starts at state 0, ends at last, steps of 0/+1
        if path[0] != 0 or path[-1] != len(labels) - 1:
            continue
        if any(b - a not in (0, 1) for a, b in zip(path, path[1:])):
            continue
        constrained_scores.append(path_score([labels[i] for i in path]))

    def logadd(values):
        values = np.array(values)
        m = values.max()
        return m + np.log(np.exp(values - m).sum())

    return logadd(free_scores) - logadd(constrained_scores)


class TestAsgLoss:
    def test_matches_brute_force(self, rng):
        classes, t, labels = 3, 4, [0, 1]
        table = default_asg_transition_probabilities(classes, seed=1)
        init = default_asg_initial_probabilities(classes, seed=1)
        trans_log = np.log(np.maximum(table[1:, 1:], 1e-300))
        init_log = np.log(np.maximum(init[1:], 1e-300))
        for _ in range(3):
            emissions = rng.randn(1, t, classes)
            expected = brute_force_asg(emissions[0], t, labels, trans_log, init_log)
            actual = float(asg_loss(
                jnp.asarray(emissions, jnp.float32), jnp.asarray([t]),
                jnp.asarray([labels], dtype=jnp.int32), jnp.asarray([len(labels)]),
                transition_probabilities=jnp.asarray(table),
                initial_probabilities=jnp.asarray(init))[0])
            np.testing.assert_allclose(actual, expected, rtol=1e-4)

    def test_variable_lengths_and_padding(self, rng):
        classes = 3
        table = default_asg_transition_probabilities(classes)
        init = default_asg_initial_probabilities(classes)
        emissions = rng.randn(2, 6, classes).astype(np.float32)
        labels = np.array([[0, 1, -1], [2, -1, -1]], dtype=np.int32)
        base = np.asarray(asg_loss(jnp.asarray(emissions), jnp.asarray([6, 4]),
                                   jnp.asarray(labels), jnp.asarray([2, 1]),
                                   transition_probabilities=jnp.asarray(table),
                                   initial_probabilities=jnp.asarray(init)))
        # Padding time and labels must not change the loss.
        padded_em = np.concatenate([emissions, rng.randn(2, 3, classes).astype(np.float32)],
                                   axis=1)
        padded_labels = np.concatenate([labels, -np.ones((2, 2), np.int32)], axis=1)
        padded = np.asarray(asg_loss(jnp.asarray(padded_em), jnp.asarray([6, 4]),
                                     jnp.asarray(padded_labels), jnp.asarray([2, 1]),
                                     transition_probabilities=jnp.asarray(table),
                                     initial_probabilities=jnp.asarray(init)))
        np.testing.assert_allclose(padded, base, rtol=1e-5)
        assert np.isfinite(base).all() and (base > 0).all()  # free >= constrained

    def test_gradients_flow_to_emissions_and_transitions(self, rng):
        classes = 4
        emissions = jnp.asarray(rng.randn(2, 5, classes), jnp.float32)
        labels = jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32)
        trans = jnp.asarray(rng.rand(classes, classes), jnp.float32)
        init = jnp.zeros((classes,), jnp.float32)

        def loss(em, tr):
            return jnp.sum(asg_loss(em, jnp.asarray([5, 5]), labels, jnp.asarray([2, 2]),
                                    transition_log_scores=tr, initial_log_scores=init))

        g_em, g_tr = jax.grad(loss, argnums=(0, 1))(emissions, trans)
        assert np.isfinite(np.asarray(g_em)).all()
        assert np.isfinite(np.asarray(g_tr)).all()
        assert np.abs(np.asarray(g_tr)).sum() > 0

    def test_default_tables_match_reference_layout(self):
        table = default_asg_transition_probabilities(29)
        assert table.shape == (30, 30)
        np.testing.assert_allclose(table[:, 1:].sum(axis=0), 1.0)
        assert (table[0, :] == 0).all() and (table[:, 0] == 0).all()
        init = default_asg_initial_probabilities(29)
        assert init.shape == (30,)
        np.testing.assert_allclose(init.sum(), 1.0)
        assert init[0] == 0


class TestNormalizationInvariance:
    def test_log_softmax_emissions_leave_loss_unchanged(self, rng=None):
        """Per-frame log-softmax subtracts the same sum_t lse(logits_t) from every
        length-L path in BOTH graphs, so the ASG loss is invariant — the training path
        (trainer.loss_fn) relies on this to normalize emissions for optimizer stability
        without changing the criterion."""
        rand = np.random.RandomState(3)
        batch, t_max, classes, u = 3, 12, 6, 4
        emissions = jnp.asarray(rand.randn(batch, t_max, classes).astype(np.float32) * 3)
        logit_lengths = jnp.asarray([12, 9, 11], jnp.int32)
        labels = jnp.asarray(rand.randint(0, classes, (batch, u)), jnp.int32)
        # De-duplicate adjacent labels (the ASG codec invariant).
        labels_np = np.array(labels)
        for b in range(batch):
            for i in range(1, u):
                if labels_np[b, i] == labels_np[b, i - 1]:
                    labels_np[b, i] = (labels_np[b, i] + 1) % classes
        labels = jnp.asarray(labels_np)
        label_lengths = jnp.asarray([4, 3, 4], jnp.int32)

        raw = asg_loss(emissions, logit_lengths, labels, label_lengths)
        normalized = asg_loss(jax.nn.log_softmax(emissions, axis=-1), logit_lengths,
                              labels, label_lengths)
        np.testing.assert_allclose(np.asarray(normalized), np.asarray(raw),
                                   rtol=1e-4, atol=1e-3)
