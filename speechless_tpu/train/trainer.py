"""Jitted CTC training step with optional mesh sharding, Adam, and layer freezing.

Replaces the reference's Keras `fit_generator` graph (`/root/reference/speechless/net.py:359-406,
541-576`) with a functional train step:

* loss = mean over the batch of per-utterance CTC NLL on logits (the reference's
  `ctc_batch_cost` Lambda + mean reduction);
* Adam(1e-4) by default (`net.py:132`), via optax;
* frozen layers receive zero updates (`net.py:335-339` sets `trainable=False`; here a
  per-layer mask on the optimizer updates, which also zeroes their Adam moments);
* one `jax.jit` with donated state serves single-chip and mesh-sharded (DP+TP) execution —
  sharding is carried by the input/param shardings, XLA inserts the ICI collectives.
"""
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import wav2letter as w2l
from ..ops.ctc import ctc_loss_from_logits


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    dropout_rng: jax.Array


class Batch(NamedTuple):
    """One statically-shaped training batch (padded within a length bucket)."""
    inputs: jnp.ndarray          # (B, T, F) float32 features
    input_lengths: jnp.ndarray   # (B,) int32 valid frame counts
    labels: jnp.ndarray          # (B, U) int32, -1 padded
    label_lengths: jnp.ndarray   # (B,) int32


class WavBatch(NamedTuple):
    """A raw-audio batch for the fully-fused (features-on-device) training path."""
    wavs: jnp.ndarray            # (B, samples) float32 zero-padded 16 kHz audio
    wav_lengths: jnp.ndarray     # (B,) int32 true sample counts
    labels: jnp.ndarray          # (B, U) int32, -1 padded
    label_lengths: jnp.ndarray   # (B,) int32


def make_lr_schedule(base_learning_rate: float = 1e-4,
                     warmup_steps: int = 0,
                     decay: Optional[str] = None,
                     decay_steps: Optional[int] = None,
                     end_value_fraction: float = 0.01):
    """Optional warmup + decay learning-rate schedule for `make_optimizer`.

    Returns the plain float when neither warmup nor decay is requested (the
    reference's regime: fixed Adam 1e-4, `net.py:132`), else an optax schedule —
    `optax.adam` accepts either. ``decay="cosine"`` anneals from the peak to
    ``end_value_fraction * base`` over ``decay_steps`` TOTAL steps (warmup included);
    ``decay=None`` with ``warmup_steps > 0`` ramps linearly from 0 to the base rate
    and holds. Schedules key off the Adam step count inside the checkpointed
    optimizer state, so `train_or_resume` continues them correctly across restarts.
    """
    if not warmup_steps and decay is None:
        return base_learning_rate
    if decay == "cosine":
        if not decay_steps:
            raise ValueError("decay_steps (total steps incl. warmup) is required "
                             "for cosine decay")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_learning_rate,
            warmup_steps=warmup_steps, decay_steps=decay_steps,
            end_value=base_learning_rate * end_value_fraction)
    if decay is None:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_learning_rate, warmup_steps),
             optax.constant_schedule(base_learning_rate)], [warmup_steps])
    raise ValueError("unknown decay {!r}; expected 'cosine' or None".format(decay))


def make_optimizer(learning_rate=1e-4,
                   trainable: Optional[List[bool]] = None,
                   gradient_clip_norm: Optional[float] = None,
                   accumulate_steps: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """Adam with optional per-layer freezing mask, global-norm gradient clipping, and
    gradient accumulation.

    ``learning_rate`` is a float or an optax schedule (see `make_lr_schedule`).

    ``gradient_clip_norm`` guards late training on noisy corpora: a near-converged
    (peaky) model occasionally meets a batch whose CTC gradient is orders of magnitude
    above steady state, and one such step can throw Adam into a multi-epoch loss
    blowup (observed on the hard-tier synthetic corpus: loss 0.7 -> 140 in one epoch,
    ~15 epochs to recover). Off by default — the reference trains unclipped Adam
    (`net.py:132`) and easy corpora never trip it.

    ``accumulate_steps=k`` applies one Adam update per k micro-batches from their mean
    gradient (`optax.MultiSteps`). Because the loss is the batch MEAN and bucketed
    training batches have one static size, k accumulated micro-batches step exactly
    like one k-times-larger batch — large effective batches at a fixed HBM footprint
    (activation memory is the single-chip batch limiter; the reference has no
    equivalent). Clipping wraps the ACCUMULATED gradient; schedules advance once per
    real update, so decay horizons count effective steps."""
    optimizer = optax.adam(learning_rate)
    if gradient_clip_norm is not None:
        optimizer = optax.chain(optax.clip_by_global_norm(gradient_clip_norm), optimizer)
    if trainable is not None and not all(trainable):
        def labels(params):
            return [jax.tree.map(lambda _: "train" if flag else "freeze", layer)
                    for layer, flag in zip(params, trainable)]
        # multi_transform + set_to_zero: frozen layers get exactly zero updates
        # (optax.masked would pass raw gradients through instead).
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels)
    if accumulate_steps is not None:
        if accumulate_steps < 1:
            raise ValueError("accumulate_steps must be >= 1, got {}".format(
                accumulate_steps))
        if accumulate_steps > 1:
            optimizer = optax.MultiSteps(optimizer, every_k_schedule=accumulate_steps)
    return optimizer


def init_train_state(config: w2l.Wav2LetterConfig, optimizer: optax.GradientTransformation,
                     rng: jax.Array, params: Optional[Any] = None) -> TrainState:
    param_rng, dropout_rng = jax.random.split(rng)
    if params is None:
        params = w2l.init_params(config, param_rng)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params), dropout_rng=dropout_rng)


def loss_fn(config: w2l.Wav2LetterConfig, params: Any, batch: Batch,
            dropout_rng: Optional[jax.Array] = None, train: bool = True,
            criterion: str = "ctc", asg_transitions: Optional[jnp.ndarray] = None,
            asg_initials: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CTC (or ASG) loss over the batch; also returns per-example losses.

    ``criterion``: "ctc" (lax.scan recursion), "ctc_pallas" (Pallas kernels — same
    contract, parity-tested), or "asg"."""
    logits = w2l.apply(config, params, batch.inputs, train=train, dropout_rng=dropout_rng)
    logit_lengths = w2l.prediction_lengths(config, batch.input_lengths)
    if criterion in ("ctc", "ctc_pallas", "ctc_pallas_sharded"):
        blank = config.grapheme_set_size - 1
        if criterion == "ctc_pallas":
            from ..ops.ctc_pallas import ctc_loss_from_logits_pallas
            per_example = ctc_loss_from_logits_pallas(logits, logit_lengths, batch.labels,
                                                      batch.label_lengths, blank)
        elif criterion == "ctc_pallas_sharded":
            # Under a (data, model) mesh: shard_map the kernel over the data axis.
            from ..ops.ctc_pallas import ctc_loss_from_logits_pallas_sharded
            from ..parallel.mesh import DATA_AXIS
            per_example = ctc_loss_from_logits_pallas_sharded(
                logits, logit_lengths, batch.labels, batch.label_lengths, blank,
                data_axis=DATA_AXIS)
        else:
            per_example = ctc_loss_from_logits(logits, logit_lengths, batch.labels,
                                               batch.label_lengths, blank)
        # Feasibility guard: a label needing more frames than the utterance has (length
        # + adjacent repeats > T') admits NO alignment — its "loss" is -NEG_INF ~ 1e30
        # and one such example poisons the batch mean AND the gradient step (observed:
        # epoch loss 4.5e27 from 3 bad utterances in a 1000-utterance corpus). Such
        # examples carry no usable training signal; mask them to zero like ASG's
        # empty-label guard (ops/asg.py) instead of letting data quality destroy a run.
        repeats = jnp.sum((batch.labels[:, 1:] == batch.labels[:, :-1])
                          & (batch.labels[:, 1:] >= 0), axis=1)
        feasible = batch.label_lengths + repeats <= logit_lengths
        per_example = jnp.where(feasible, per_example, 0.0)
    elif criterion == "asg":
        from ..ops.asg import asg_loss
        # Per-frame log-softmax before the ASG graphs: every length-L path in BOTH the
        # free and constrained graph accumulates the same -sum_t lse(logits_t), so the
        # loss VALUE is mathematically unchanged — but the reparameterization removes
        # the objective's scale degeneracy (raw scores let Adam grow all logits
        # unboundedly along a loss-invariant direction until f32 path-score cancellation
        # fails; observed as a sudden 1e9 loss blowup at ~250 steps on realistic
        # shapes). Invariance is pinned by tests/test_asg.py.
        per_example = asg_loss(jax.nn.log_softmax(logits, axis=-1), logit_lengths,
                               batch.labels, batch.label_lengths,
                               transition_probabilities=asg_transitions,
                               initial_probabilities=asg_initials)
    elif criterion == "asg_trainable":
        from ..ops.asg import asg_loss
        # Trainable transition/initial tables: they ride the params pytree as a trailing
        # pseudo-layer (`w2l.apply` zips with config.layers and ignores it), so autodiff
        # reaches them through the constrained/free graph recursions and Adam updates
        # them alongside the conv weights — wav2letter LEARNS its transitions
        # (arXiv:1609.03193 §2.3; the reference only ships the random init,
        # `net.py:271-289`, and never trains it).
        tables = params[-1]
        per_example = asg_loss(jax.nn.log_softmax(logits, axis=-1), logit_lengths,
                               batch.labels, batch.label_lengths,
                               transition_log_scores=tables["asg_transitions"],
                               initial_log_scores=tables["asg_initials"])
    else:
        raise ValueError("Unknown criterion: {}".format(criterion))
    return jnp.mean(per_example), per_example


def _update_step(config: w2l.Wav2LetterConfig, optimizer: optax.GradientTransformation,
                 criterion: str, asg_transitions: Optional[jnp.ndarray],
                 asg_initials: Optional[jnp.ndarray], from_wav: bool = False,
                 spec_augment=None):
    """The un-jitted update body shared by the single-step, multi-step, and fused-features
    train steps: ``(state, batch) -> (state, metrics)``.

    ``spec_augment``: optional `ops.specaugment.SpecAugment` — masks the feature batch
    on device before the forward pass (training only; eval is never augmented)."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if from_wav:
            from ..features.spectrogram import features_batch

            features, frame_counts = features_batch(batch.wavs, batch.wav_lengths)
            batch = Batch(inputs=features, input_lengths=frame_counts,
                          labels=batch.labels, label_lengths=batch.label_lengths)
        dropout_rng, next_rng = jax.random.split(state.dropout_rng)
        if spec_augment is not None:
            from ..ops.specaugment import apply_spec_augment

            augment_rng, dropout_rng = jax.random.split(dropout_rng)
            batch = Batch(inputs=apply_spec_augment(augment_rng, batch.inputs,
                                                    batch.input_lengths, spec_augment),
                          input_lengths=batch.input_lengths, labels=batch.labels,
                          label_lengths=batch.label_lengths)
        (loss, per_example), grads = jax.value_and_grad(
            lambda p: loss_fn(config, p, batch, dropout_rng=dropout_rng,
                              criterion=criterion, asg_transitions=asg_transitions,
                              asg_initials=asg_initials), has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                               dropout_rng=next_rng)
        return new_state, {"loss": loss, "per_example_loss": per_example}

    return train_step


def make_train_step(config: w2l.Wav2LetterConfig, optimizer: optax.GradientTransformation,
                    donate: bool = True, criterion: str = "ctc",
                    asg_transitions: Optional[jnp.ndarray] = None,
                    asg_initials: Optional[jnp.ndarray] = None,
                    spec_augment=None):
    """Build the jitted update step: ``(state, batch) -> (state, metrics)``."""
    return jax.jit(_update_step(config, optimizer, criterion, asg_transitions,
                                asg_initials, spec_augment=spec_augment),
                   donate_argnums=(0,) if donate else ())


def make_wav_train_step(config: w2l.Wav2LetterConfig,
                        optimizer: optax.GradientTransformation,
                        donate: bool = True, criterion: str = "ctc",
                        asg_transitions: Optional[jnp.ndarray] = None,
                        asg_initials: Optional[jnp.ndarray] = None,
                        spec_augment=None):
    """Fully-fused update step from raw audio: feature extraction runs on device inside the
    same XLA program as forward/backward/Adam (the bench and multichip-dryrun path).

    ``(state, WavBatch) -> (state, metrics)``; sharding carried by input/param shardings.
    """
    return jax.jit(_update_step(config, optimizer, criterion, asg_transitions,
                                asg_initials, from_wav=True, spec_augment=spec_augment),
                   donate_argnums=(0,) if donate else ())


def _scan_steps(single_step):
    """Wrap an update body in a `lax.scan` over a leading steps axis: ``k`` optimizer
    updates run inside ONE device dispatch. On tunneled backends each dispatch costs
    ~9 ms of execute-RPC latency (BASELINE.md step ablation); scanning k steps amortizes
    that to ~0.9 ms/step at k=10 — the measured-but-unshipped ~1830 utt/s of round 1."""

    def multi_step(state: TrainState, stacked) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(carry, batch):
            carry, metrics = single_step(carry, batch)
            return carry, metrics["loss"]

        state, losses = jax.lax.scan(body, state, stacked)
        return state, {"loss": jnp.mean(losses), "step_losses": losses}

    return multi_step


def make_multi_step(config: w2l.Wav2LetterConfig, optimizer: optax.GradientTransformation,
                    donate: bool = True, criterion: str = "ctc",
                    asg_transitions: Optional[jnp.ndarray] = None,
                    asg_initials: Optional[jnp.ndarray] = None,
                    spec_augment=None):
    """Device-side multi-step training: ``(state, stacked_batch) -> (state, metrics)``
    where every `Batch` field carries a leading steps axis (see
    `data.batching.stack_batches`). The steps count is static per compilation; the train
    loop keeps it fixed so exactly one program serves the whole run."""
    return jax.jit(_scan_steps(_update_step(config, optimizer, criterion, asg_transitions,
                                            asg_initials, spec_augment=spec_augment)),
                   donate_argnums=(0,) if donate else ())


def make_multi_wav_step(config: w2l.Wav2LetterConfig,
                        optimizer: optax.GradientTransformation,
                        donate: bool = True, criterion: str = "ctc",
                        asg_transitions: Optional[jnp.ndarray] = None,
                        asg_initials: Optional[jnp.ndarray] = None,
                        spec_augment=None):
    """Multi-step over `WavBatch`es with a leading steps axis: k fused
    (features + fwd/bwd + Adam) updates per device dispatch."""
    return jax.jit(_scan_steps(_update_step(config, optimizer, criterion, asg_transitions,
                                            asg_initials, from_wav=True,
                                            spec_augment=spec_augment)),
                   donate_argnums=(0,) if donate else ())


def make_device_epoch_step(config: w2l.Wav2LetterConfig,
                           optimizer: optax.GradientTransformation,
                           batch_size: int, steps: int,
                           donate: bool = True, criterion: str = "ctc",
                           shard_batch: bool = False,
                           asg_transitions: Optional[jnp.ndarray] = None,
                           asg_initials: Optional[jnp.ndarray] = None,
                           spec_augment=None):
    """Whole-epoch training over a device-resident corpus (`data.device_dataset`):
    ``(state, dataset, rng) -> (state, metrics)`` runs ``steps`` optimizer updates in ONE
    device dispatch — each step samples ``batch_size`` corpus rows uniformly without
    replacement within the batch (the reference's `random.sample`, `corpus.py:224-226`)
    and gathers them with `jnp.take`, so steady-state training moves zero bytes over the
    host link.

    ``shard_batch``: under a mesh (call inside `jax.set_mesh`), constrain the gathered
    batch onto the data axis so DP compute splits across chips even though the dataset
    itself is replicated."""
    update = _update_step(config, optimizer, criterion, asg_transitions, asg_initials,
                          spec_augment=spec_augment)

    def epoch_step(state: TrainState, dataset, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        example_count = dataset.inputs.shape[0]

        def body(carry, step_rng):
            indices = jax.random.choice(step_rng, example_count, (batch_size,),
                                        replace=False)
            batch = Batch(*(jnp.take(field, indices, axis=0) for field in dataset))
            if shard_batch:
                from jax.sharding import PartitionSpec as P

                from ..parallel.mesh import DATA_AXIS
                batch = Batch(*(jax.lax.with_sharding_constraint(
                    field, P(DATA_AXIS, *([None] * (field.ndim - 1))))
                    for field in batch))
            carry, metrics = update(carry, batch)
            return carry, metrics["loss"]

        state, losses = jax.lax.scan(body, state, jax.random.split(rng, steps))
        return state, {"loss": jnp.mean(losses), "step_losses": losses}

    return jax.jit(epoch_step, donate_argnums=(0,) if donate else ())


def make_eval_step(config: w2l.Wav2LetterConfig, criterion: str = "ctc",
                   asg_transitions: Optional[jnp.ndarray] = None,
                   asg_initials: Optional[jnp.ndarray] = None):
    """Jitted eval: ``(params, batch) -> (log_probs, logit_lengths, per_example_loss)``.

    Returns log-softmax outputs (for decoding) plus the per-utterance losses — the fused
    equivalent of the reference's combined decoding_net + loss_net session run
    (`net.py:456-459`)."""

    def eval_step(params: Any, batch: Batch):
        logits = w2l.apply(config, params, batch.inputs, train=False)
        logit_lengths = w2l.prediction_lengths(config, batch.input_lengths)
        if criterion in ("ctc", "ctc_pallas", "ctc_pallas_sharded"):
            blank = config.grapheme_set_size - 1
            per_example = ctc_loss_from_logits(logits, logit_lengths, batch.labels,
                                               batch.label_lengths, blank)
        elif criterion == "asg":
            from ..ops.asg import asg_loss
            # Same normalization as the training loss (value-invariant, see loss_fn).
            per_example = asg_loss(jax.nn.log_softmax(logits, axis=-1), logit_lengths,
                                   batch.labels, batch.label_lengths,
                                   transition_probabilities=asg_transitions,
                                   initial_probabilities=asg_initials)
        elif criterion == "asg_trainable":
            from ..ops.asg import asg_loss
            tables = params[-1]
            per_example = asg_loss(jax.nn.log_softmax(logits, axis=-1), logit_lengths,
                                   batch.labels, batch.label_lengths,
                                   transition_log_scores=tables["asg_transitions"],
                                   initial_log_scores=tables["asg_initials"])
        else:
            raise ValueError("Unknown criterion: {}".format(criterion))
        return jax.nn.log_softmax(logits, axis=-1), logit_lengths, per_example

    return jax.jit(eval_step)
