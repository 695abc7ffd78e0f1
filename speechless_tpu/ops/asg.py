"""ASG (Auto SeGmentation) criterion, TPU-native.

The reference declares ASG support but raises ``NotImplementedError`` in the loss lambda
(`/root/reference/speechless/net.py:396-399`); it does ship the grapheme codec (twice/thrice
repetition symbols) and default transition/initial probability tables (`net.py:271-289`).
This module implements the actual criterion (Collobert et al., arXiv:1609.03193 §2.3):

    loss = logadd over ALL length-T paths (free graph)
         - logadd over paths labelling the utterance (constrained graph)

with per-step scores ``emit[t, c] + trans[c_prev -> c]``. Both recursions are ``lax.scan``s
over time, vectorized over (batch, states); the free graph's transition step is a (C, C)
log-matmul, tiny for grapheme alphabets. Gradients flow by autodiff through the scans
(including into the transition table, which is therefore trainable).

Table conventions follow the reference's defaults: ``transition_probabilities`` is a
column-stochastic ``(C+1, C+1)`` matrix with index 0 a pseudo-state (transitions[to+1,
from+1]); ``initial_probabilities`` is ``(C+1,)`` with index 0 unused.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ctc import NEG_INF, SCAN_UNROLL


def default_asg_transition_probabilities(grapheme_set_size: int,
                                         seed: int = 0) -> np.ndarray:
    """Random column-stochastic transition table in the reference's layout
    (`net.py:271-281`)."""
    rand = np.random.RandomState(seed)
    table = rand.randint(1, 15, (grapheme_set_size + 1, grapheme_set_size + 1)).astype(
        np.float64)
    table[0, :] = 0.0
    table[:, 0] = 0.0
    norms = np.concatenate(([1.0], table[:, 1:].sum(axis=0)))
    return table / norms


def default_asg_initial_probabilities(grapheme_set_size: int, seed: int = 0) -> np.ndarray:
    rand = np.random.RandomState(seed)
    initial = rand.randint(1, 15, grapheme_set_size + 1).astype(np.float64)
    initial[0] = 0.0
    return initial / initial.sum()


def _log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-300)), NEG_INF)


def log_score_tables(transition_probabilities: np.ndarray,
                     initial_probabilities: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Convert reference-layout (C+1) probability tables into the (classes, classes)/
    (classes,) log-score tables that `asg_loss` consumes directly — the natural
    parameterization for TRAINING the tables (wav2letter learns its transition scores;
    the reference only ships the random init, `net.py:271-289`). Value parity with
    passing the probability tables is pinned in tests/test_asg.py."""
    trans = np.asarray(_log(jnp.asarray(transition_probabilities)[1:, 1:]), np.float32)
    init = np.asarray(_log(jnp.asarray(initial_probabilities)[1:]), np.float32)
    return trans, init


def _free_graph_logadd(emissions: jnp.ndarray, logit_lengths: jnp.ndarray,
                       trans_log: jnp.ndarray, init_log: jnp.ndarray) -> jnp.ndarray:
    """logadd over all paths: scores (B, T, C) -> (B,)."""
    batch, t_max, class_count = emissions.shape

    score0 = emissions[:, 0] + init_log[None, :]

    def step(carry, inputs):
        t, emit = inputs
        score, final = carry
        # lse over source class: (B, C_from) + (C_to, C_from) -> (B, C_to)
        expanded = score[:, None, :] + trans_log[None, :, :]
        new_score = jax.nn.logsumexp(expanded, axis=2) + emit
        active = (t < logit_lengths)[:, None]
        score = jnp.where(active, new_score, score)
        total = jax.nn.logsumexp(score, axis=1)
        final = jnp.where(t == logit_lengths - 1, total, final)
        return (score, final), None

    final0 = jnp.where(logit_lengths == 1, jax.nn.logsumexp(score0, axis=1),
                       jnp.full((batch,), NEG_INF))
    (_, final), _ = jax.lax.scan(step, (score0, final0),
                                 (jnp.arange(1, t_max), emissions[:, 1:].swapaxes(0, 1)),
                                 unroll=SCAN_UNROLL)
    return final


def _constrained_graph_logadd(emissions: jnp.ndarray, logit_lengths: jnp.ndarray,
                              labels: jnp.ndarray, label_lengths: jnp.ndarray,
                              trans_log: jnp.ndarray, init_log: jnp.ndarray) -> jnp.ndarray:
    """logadd over monotone alignments of the label sequence: -> (B,)."""
    batch, t_max, class_count = emissions.shape
    label_max = labels.shape[1]
    safe_labels = jnp.where(labels < 0, 0, labels)
    u_range = jnp.arange(label_max)[None, :]

    # Per-state emission scores for all t: (B, T, U) via one-hot matmul (MXU).
    one_hot = jax.nn.one_hot(safe_labels, class_count, dtype=emissions.dtype)  # (B, U, C)
    state_emissions = jnp.einsum("btc,buc->tbu", emissions, one_hot)  # (T, B, U)

    # stay: label[i] -> label[i]; advance: label[i-1] -> label[i]
    stay_trans = trans_log[safe_labels, safe_labels]  # (B, U)
    prev_labels = jnp.concatenate([safe_labels[:, :1], safe_labels[:, :-1]], axis=1)
    advance_trans = trans_log[safe_labels, prev_labels]  # (B, U)

    state_mask = u_range < label_lengths[:, None]
    alpha0 = jnp.where(u_range == 0, state_emissions[0] +
                       init_log[safe_labels[:, 0]][:, None], NEG_INF)
    alpha0 = jnp.where(state_mask, alpha0, NEG_INF)

    def final_at(alpha):
        return jnp.take_along_axis(alpha, jnp.maximum(label_lengths[:, None] - 1, 0),
                                   axis=1)[:, 0]

    def step(carry, inputs):
        t, emit = inputs
        alpha, final = carry
        stay = alpha + stay_trans
        shifted = jnp.concatenate([jnp.full_like(alpha[:, :1], NEG_INF), alpha[:, :-1]],
                                  axis=1)
        advance = shifted + advance_trans
        new_alpha = jnp.logaddexp(stay, advance) + emit
        new_alpha = jnp.where(state_mask, new_alpha, NEG_INF)
        active = (t < logit_lengths)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        final = jnp.where(t == logit_lengths - 1, final_at(alpha), final)
        return (alpha, final), None

    final0 = jnp.where(logit_lengths == 1, final_at(alpha0), jnp.full((batch,), NEG_INF))
    (_, final), _ = jax.lax.scan(step, (alpha0, final0),
                                 (jnp.arange(1, t_max), state_emissions[1:]),
                                 unroll=SCAN_UNROLL)
    return final


def asg_loss(emissions: jnp.ndarray, logit_lengths: jnp.ndarray, labels: jnp.ndarray,
             label_lengths: jnp.ndarray,
             transition_probabilities: Optional[jnp.ndarray] = None,
             initial_probabilities: Optional[jnp.ndarray] = None,
             transition_log_scores: Optional[jnp.ndarray] = None,
             initial_log_scores: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-example ASG loss.

    Args:
      emissions: ``(batch, time, classes)`` unnormalized per-frame scores (ASG uses raw
        scores, not softmax — arXiv:1609.03193 §2.3).
      logit_lengths / labels / label_lengths: as in ``ctc_loss`` (labels use the ASG codec's
        repetition graphemes; no blank).
      transition_probabilities/initial_probabilities: reference-layout (C+1) tables; or pass
        log-score tables (classes, classes)/(classes,) directly (trainable parameters).
    Returns:
      ``(batch,)`` losses.
    """
    class_count = emissions.shape[2]
    if transition_log_scores is None:
        if transition_probabilities is None:
            transition_probabilities = jnp.asarray(
                default_asg_transition_probabilities(class_count))
        transition_log_scores = _log(jnp.asarray(transition_probabilities)[1:, 1:])
    if initial_log_scores is None:
        if initial_probabilities is None:
            initial_probabilities = jnp.asarray(default_asg_initial_probabilities(class_count))
        initial_log_scores = _log(jnp.asarray(initial_probabilities)[1:])

    free = _free_graph_logadd(emissions, logit_lengths, transition_log_scores,
                              initial_log_scores)
    constrained = _constrained_graph_logadd(emissions, logit_lengths, labels, label_lengths,
                                            transition_log_scores, initial_log_scores)
    # Empty labels have no valid ASG alignment, and neither do labels longer than the
    # frame count (a monotone alignment needs U <= T'); either case would contribute a
    # ~1e30 "loss" that poisons the batch mean and gradient. Mask to zero — corpora
    # exclude such transcripts, this guards stragglers.
    feasible = (label_lengths > 0) & (label_lengths <= logit_lengths)
    return jnp.where(feasible, free - constrained, 0.0)


def asg_viterbi_decode(emissions: jnp.ndarray, logit_lengths: jnp.ndarray,
                       transition_log_scores: jnp.ndarray,
                       initial_log_scores: jnp.ndarray
                       ) -> jnp.ndarray:
    """Transition-aware best-path decode: argmax over length-T state paths of
    ``sum_t emit[t, c_t] + trans[c_t, c_{t-1}]`` (+ init at t=0).

    The plain per-frame argmax ignores the transition model entirely; once the tables
    are trained (`train_asg_transitions=True` — see trainer.loss_fn "asg_trainable")
    the Viterbi path uses what they learned. Returns the dense (B, T) state sequence
    (repeat-merge + repetition-grapheme decoding happens in the codec, exactly as for
    the argmax path). Jit-friendly: one forward `lax.scan` carrying (delta, final
    state) and emitting backpointers, then a reverse backtrace scan; padded frames
    (t >= length) repeat the final state.
    """
    batch, t_max, class_count = emissions.shape
    identity_bp = _col_identity(batch, class_count)

    def forward(carry, inputs):
        t, emit = inputs
        delta, final_state = carry
        # expanded[b, to, frm] = delta[b, frm] + trans[to, frm]
        expanded = delta[:, None, :] + transition_log_scores[None, :, :]
        best_prev = jnp.argmax(expanded, axis=2).astype(jnp.int32)     # (B, C)
        new_delta = jnp.max(expanded, axis=2) + emit
        active = (t < logit_lengths)[:, None]
        delta = jnp.where(active, new_delta, delta)
        final_state = jnp.where(t == logit_lengths - 1,
                                jnp.argmax(delta, axis=1).astype(jnp.int32),
                                final_state)
        return (delta, final_state), jnp.where(active, best_prev, identity_bp)

    delta0 = emissions[:, 0] + initial_log_scores[None, :]
    final0 = jnp.where(logit_lengths == 1, jnp.argmax(delta0, axis=1),
                       jnp.zeros((batch,), jnp.int32)).astype(jnp.int32)
    (_, final_state), backpointers = jax.lax.scan(
        forward, (delta0, final0),
        (jnp.arange(1, t_max), emissions[:, 1:].swapaxes(0, 1)),
        unroll=SCAN_UNROLL)

    def backtrace(state, inputs):
        t, bp = inputs  # bp: (B, C) best-previous at step t
        prev = jnp.take_along_axis(bp, state[:, None], axis=1)[:, 0]
        state = jnp.where(t < logit_lengths, prev, state)
        return state, state

    _, states_rev = jax.lax.scan(
        backtrace, final_state,
        (jnp.arange(t_max - 1, 0, -1), backpointers[::-1]),
        unroll=SCAN_UNROLL)
    path = jnp.concatenate([states_rev[::-1].T, final_state[:, None]], axis=1)
    # Pad frames past each length with the final state (merge-repeat absorbs them).
    t_range = jnp.arange(t_max)[None, :]
    return jnp.where(t_range < logit_lengths[:, None], path, final_state[:, None])


def _col_identity(batch: int, class_count: int) -> jnp.ndarray:
    """(B, C) backpointer block that maps every state to itself (inactive frames)."""
    return jnp.broadcast_to(jnp.arange(class_count, dtype=jnp.int32)[None, :],
                            (batch, class_count))
