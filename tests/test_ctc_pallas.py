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


class TestShardedPallas:
    """`ctc_loss_from_logits_pallas_sharded`: the kernel per data shard via shard_map."""

    def _mesh(self):
        from speechless_tpu.parallel import mesh as pmesh

        return pmesh.make_mesh(jax.devices()[:8], model_parallelism=2)

    def test_sharded_loss_and_grad_match_scan(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from speechless_tpu.ops.ctc import ctc_loss_from_logits
        from speechless_tpu.ops.ctc_pallas import ctc_loss_from_logits_pallas_sharded

        mesh = self._mesh()
        batch, t_max, u_max, classes = 8, 24, 5, 6
        logits = jnp.asarray(rng.randn(batch, t_max, classes).astype(np.float32))
        logit_lengths = jnp.asarray(
            rng.randint(2 * u_max + 2, t_max + 1, batch).astype(np.int32))
        labels = jnp.asarray(rng.randint(0, classes - 1, (batch, u_max)).astype(np.int32))
        label_lengths = jnp.asarray(rng.randint(1, u_max + 1, batch).astype(np.int32))
        labels = jnp.where(jnp.arange(u_max)[None] < label_lengths[:, None], labels, -1)
        blank = classes - 1

        sharding = NamedSharding(mesh, P("data"))
        put = lambda x: jax.device_put(x, sharding)
        with jax.set_mesh(mesh):
            actual = np.asarray(jax.jit(
                lambda *a: ctc_loss_from_logits_pallas_sharded(*a, blank=blank))(
                    put(logits), put(logit_lengths), put(labels), put(label_lengths)))
            grad = np.asarray(jax.jit(jax.grad(lambda lg: jnp.sum(
                ctc_loss_from_logits_pallas_sharded(
                    lg, logit_lengths, labels, label_lengths, blank))))(put(logits)))
        expected = np.asarray(ctc_loss_from_logits(logits, logit_lengths, labels,
                                                   label_lengths, blank))
        grad_expected = np.asarray(jax.grad(lambda lg: jnp.sum(ctc_loss_from_logits(
            lg, logit_lengths, labels, label_lengths, blank)))(logits))
        np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(grad, grad_expected, rtol=1e-4, atol=1e-5)

    def test_train_step_with_sharded_criterion(self, rng):
        """The full meshed train step accepts criterion='ctc_pallas_sharded'."""
        from speechless_tpu.parallel import mesh as pmesh
        from speechless_tpu.train import (Batch, init_train_state, make_optimizer,
                                          make_train_step)

        from test_train import synthetic_batch, tiny_config

        mesh = self._mesh()
        config = tiny_config()
        optimizer = make_optimizer(1e-3)
        state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
        shardings = pmesh.param_shardings(mesh, config.layer_names)
        state = state._replace(params=pmesh.shard_params(state.params, shardings),
                               opt_state=None)
        state = state._replace(opt_state=optimizer.init(state.params))
        batch = synthetic_batch(rng, config, batch=8, t=40, u=5)
        device_batch = Batch(*(jax.device_put(
            jnp.asarray(f), pmesh.batch_sharding(mesh, np.ndim(f))) for f in batch))
        step = make_train_step(config, optimizer, donate=False,
                               criterion="ctc_pallas_sharded")
        with jax.set_mesh(mesh):
            new_state, metrics = step(state, device_batch)
            loss = float(metrics["loss"])
        assert np.isfinite(loss)
        assert int(new_state.step) == 1
