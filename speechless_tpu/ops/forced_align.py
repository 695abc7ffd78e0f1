"""CTC forced alignment: Viterbi over the label's CTC lattice — which frames say what.

Given per-frame grapheme log-posteriors and a KNOWN transcript, find the most probable
frame-level alignment: the maximum-score path through the transcript's interleaved
blank/label state sequence (blank, l1, blank, l2, ..., blank) under the standard CTC
transition rules (stay / advance / skip-a-blank between distinct labels). The result is
each label token's frame span — the machinery that produces the word-position data the
reference only ever CONSUMES as corpus annotations (`PositionalLabel`,
`/root/reference/speechless/labeled_example.py:32-60`); the reference has no aligner.

Runs entirely on device under `jit` (one `lax.scan` over frames carrying the (S,)
Viterbi scores + a reverse scan over backpointers), vmapped over the batch; all shapes
static (labels −1-padded to the bucket, states beyond 2·len+1 masked). Exactness is
pinned against a brute-force path enumeration in `tests/test_forced_align.py`.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                     labels: jnp.ndarray, label_lengths: jnp.ndarray,
                     blank: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Align each utterance's label sequence to its frames.

    Args:
      log_probs: (B, T, C) per-frame log posteriors.
      lengths: (B,) valid frame counts.
      labels: (B, U) int32 grapheme indices, −1-padded.
      label_lengths: (B,) valid label counts.
      blank: blank class index (last, per the CTC contract).

    Returns ``(starts, ends, scores)``: (B, U) int32 frame spans — label k emits over
    frames ``[starts[b, k], ends[b, k])``; −1 beyond ``label_lengths`` — and (B,) path
    log-scores. An infeasible label (needing more frames than the utterance has)
    yields a score ≤ −1e29; its spans are meaningless and callers must check.
    """
    t_max = log_probs.shape[1]
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1

    def align_one(lp, length, lab, lab_len):
        s_range = jnp.arange(s_max)
        is_label = s_range % 2 == 1
        # Emitted class per state; padded (−1) labels gather the last class, but those
        # states are masked invalid below.
        state_char = jnp.where(is_label, lab[jnp.minimum(s_range // 2, u_max - 1)],
                               blank)
        valid_state = s_range < 2 * lab_len + 1
        # Skip (s-2 → s) is legal into a label state whose label differs from the
        # previous label (the blank between equal labels is mandatory).
        prev2_char = jnp.concatenate([jnp.full((2,), -2, state_char.dtype),
                                      state_char[:-2]])
        can_skip = is_label & (s_range >= 3) & (state_char != prev2_char)

        emit0 = lp[0, state_char]
        alpha0 = jnp.where((s_range <= 1) & valid_state, emit0, NEG_INF)

        def step(alpha, t):
            stay = alpha
            advance = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
            skip = jnp.where(can_skip,
                             jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]]),
                             NEG_INF)
            candidates = jnp.stack([stay, advance, skip])  # (3, S)
            move = jnp.argmax(candidates, axis=0)
            best = jnp.max(candidates, axis=0)
            new_alpha = jnp.where(valid_state, best + lp[t, state_char], NEG_INF)
            active = t < length
            return (jnp.where(active, new_alpha, alpha),
                    jnp.where(active, move, 0))

        alpha, moves = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))

        end_blank = alpha[2 * lab_len]
        end_label = jnp.where(lab_len > 0, alpha[jnp.maximum(2 * lab_len - 1, 0)],
                              NEG_INF)
        end_state = jnp.where(end_label > end_blank,
                              jnp.maximum(2 * lab_len - 1, 0), 2 * lab_len)
        score = jnp.maximum(end_blank, end_label)

        def back(state, move_t):
            return state - move_t[state], state

        first_state, later_states = jax.lax.scan(back, end_state, moves,
                                                 reverse=True)
        states = jnp.concatenate([first_state[None], later_states])  # (T,)

        # Label k's span = the frames spent in state 2k+1 (contiguous by
        # construction — a Viterbi path never revisits a state).
        t_range = jnp.arange(t_max)
        in_frame = t_range < length
        label_states = 2 * jnp.arange(u_max) + 1
        visited = (states[None, :] == label_states[:, None]) & in_frame[None, :]
        starts = jnp.min(jnp.where(visited, t_range[None, :], t_max), axis=1)
        ends = jnp.max(jnp.where(visited, t_range[None, :] + 1, 0), axis=1)
        k_valid = (jnp.arange(u_max) < lab_len) & (starts < t_max)
        return (jnp.where(k_valid, starts, -1).astype(jnp.int32),
                jnp.where(k_valid, ends, -1).astype(jnp.int32),
                score)

    return jax.vmap(align_one)(log_probs, lengths, labels, label_lengths)


def word_spans_from_alignment(codec, tokens, starts, ends,
                              seconds_per_frame: float,
                              sample_rate: int = 16000):
    """Fold one utterance's per-grapheme spans into word timestamps: a word runs from
    its first grapheme's frame start to its last grapheme's frame end; the space
    grapheme separates words (the `WordAssembler` boundary rule). Returns
    ``[{"word", "start_s", "end_s"}, ...]``."""
    words = []
    chars, word_start, word_end = [], 0, 0
    for token, start, end in zip(tokens, starts, ends):
        char = codec.decode_graphemes([int(token)], merge_repeated=False)
        if char == " ":
            if chars:
                words.append({"word": "".join(chars),
                              "start_s": round(word_start * seconds_per_frame, 3),
                              "end_s": round(word_end * seconds_per_frame, 3)})
            chars = []
            continue
        if not chars:
            word_start = int(start)
        chars.append(char)
        word_end = int(end)
    if chars:
        words.append({"word": "".join(chars),
                      "start_s": round(word_start * seconds_per_frame, 3),
                      "end_s": round(word_end * seconds_per_frame, 3)})
    return words
