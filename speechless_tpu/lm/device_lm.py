"""Word-level n-gram LM as device-resident tables (HBM) for on-device beam fusion.

The reference's flagship decode runs word-level KenLM fusion inside the beam search
(`/root/reference/speechless/net.py:444-451`). Round 1 put word fusion on the host
(C++ prefix beam) and only a char-n-gram on device; this module closes that gap
(SURVEY.md §7 "Hard parts": quantized n-gram tables in HBM):

* a **vocabulary character trie** packed as a dense ``(nodes, classes)`` int32 transition
  table (row 0 = root) with a per-node completed-word id — beams walk it one gather per
  extension, so the device beam always knows the word a space would complete;
* **per-order 2-choice (cuckoo) hash tables** keyed on word-id n-grams, holding log10
  probabilities and backoff weights. Every key lives at one of exactly two slots
  (build-time eviction insert; the table doubles on an insertion cycle), so a lookup is
  TWO key gathers + one post-match value gather — no data-dependent control flow, and the
  whole Katz backoff recursion
  ``P(w|c1,c2) = tri(c1,c2,w) | bo(c1,c2) + [bi(c2,w) | bo(c2) + uni(w)]``
  jits into ~20 gathers per beam step. (Round 2 used linear probing with a build-time
  displacement bound; at max_probes=10 the probe loops were ~93% of the hybrid Pallas
  LM beam's wall — the fixed 2-probe layout cut the W=25 fused decode ~4x.)

Scoring matches `lm.ngram.ArpaLanguageModel.score_word` exactly (tests assert equality
over every (context, word) combination): context registers start as (BOS, BOS) — the ARPA
can never contain a (<s>, <s>, w) trigram or (<s>, <s>) backoff, so the uniform trigram
path degenerates to the host's shorter-n-gram scoring for the first words of a sentence.
OOV words (and OOV context) normalize to <unk>, like KenLM.
"""
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from .ngram import ArpaLanguageModel, BOS, UNK

# Mixing constants shared by the numpy builder and the jnp prober (uint32 arithmetic).
# Two independent sets: every key hashes to one slot per set (2-choice hashing).
_MIXES = ((np.uint32(2654435761), np.uint32(40503), np.uint32(2246822519)),
          (np.uint32(3266489917), np.uint32(668265263), np.uint32(374761393)))
_MIX1, _MIX2, _MIX3 = _MIXES[0]
EMPTY = np.int32(-1)


class DeviceWordLm(NamedTuple):
    """Device-resident word LM. All arrays are host numpy here; `as_device()` moves them
    once to HBM (a few MB for realistic vocabularies)."""
    trie: np.ndarray         # (nodes, classes) int32 char transitions, -1 = no edge
    node_word: np.ndarray    # (nodes,) int32 word id completed at this node, -1 = none
    uni_logp: np.ndarray     # (V,) f32 log10 P(w)
    uni_bo: np.ndarray       # (V,) f32 log10 backoff(w)
    bi_k: np.ndarray         # (S2, 2) int32 cuckoo keys (c, w), -1 = empty
    bi_logp: np.ndarray      # (S2,) f32
    bi_bo: np.ndarray        # (S2,) f32 log10 backoff(c, w)
    tri_k: np.ndarray        # (S3, 3) int32 keys (c1, c2, w), -1 = empty (order-2: size 1)
    tri_logp: np.ndarray     # (S3,) f32
    max_probes: int          # static probe bound (2: every key sits at one of 2 slots)
    bos_id: int
    unk_id: int
    space_index: int

    def as_device(self) -> "DeviceWordLm":
        import jax.numpy as jnp

        return DeviceWordLm(*(jnp.asarray(a) if isinstance(a, np.ndarray) else a
                              for a in self))


def _hash2(k1, k2, size, side=0):
    m1, m2, _ = _MIXES[side]
    with np.errstate(over="ignore"):  # uint32 wraparound is the hash
        h = k1.astype(np.uint32) * m1 ^ k2.astype(np.uint32) * m2
    return (h % np.uint32(size)).astype(np.int64)


def _hash3(k1, k2, k3, size, side=0):
    m1, m2, m3 = _MIXES[side]
    with np.errstate(over="ignore"):
        h = (k1.astype(np.uint32) * m1 ^ k2.astype(np.uint32) * m2
             ^ k3.astype(np.uint32) * m3)
    return (h % np.uint32(size)).astype(np.int64)


def _key_slot(key: np.ndarray, size: int, side: int) -> int:
    if len(key) == 2:
        return int(_hash2(key[0], key[1], size, side))
    return int(_hash3(key[0], key[1], key[2], size, side))


def _build_hash_table(keys: np.ndarray, values: List[np.ndarray]
                      ) -> Tuple[np.ndarray, List[np.ndarray], int]:
    """Cuckoo (2-choice) insert of (keys -> values) rows; returns (key table, value
    tables, probe count == 2). Every key ends up at `_key_slot(key, size, 0)` or
    `_key_slot(key, size, 1)`, so device lookups are a FIXED two-gather probe.
    Table size = next power of two >= 2 * entries, doubling on an insertion cycle."""
    entries = len(keys)
    width = keys.shape[1] if entries else 2
    size = 1
    while size < max(2 * entries, 2):
        size *= 2
    while True:
        table_keys = np.full((size, width), EMPTY, np.int32)
        table_values = [np.zeros(size, np.float32) for _ in values]
        ok = True
        for row in range(entries):
            key = keys[row].copy()
            vals = [np.float32(v[row]) for v in values]
            side = 0
            for _ in range(64 + entries // 4):
                slot = _key_slot(key, size, side)
                if table_keys[slot, 0] == EMPTY:
                    table_keys[slot] = key
                    for t, v in zip(table_values, vals):
                        t[slot] = v
                    break
                # Evict the occupant; it must move to its alternate slot.
                old_key = table_keys[slot].copy()
                old_vals = [t[slot] for t in table_values]
                table_keys[slot] = key
                for t, v in zip(table_values, vals):
                    t[slot] = v
                key, vals = old_key, old_vals
                side = 1 if _key_slot(key, size, 0) == slot else 0
            else:
                ok = False
                break
        if ok:
            return table_keys, table_values, 2
        size *= 2


def build_device_word_lm(model: ArpaLanguageModel, alphabet: Sequence[str],
                         space_index: Optional[int] = None) -> DeviceWordLm:
    """Pack a loaded ARPA model (order <= 3) into device tables.

    ``alphabet`` is the grapheme alphabet WITHOUT the blank (blank extensions never touch
    the trie). Vocabulary words containing characters outside the alphabet are dropped
    (they could never be produced by the decoder anyway)."""
    if model.order > 3:
        raise ValueError("device fusion supports n-gram order <= 3, got {}".format(
            model.order))
    alphabet = list(alphabet)
    if space_index is None:
        space_index = alphabet.index(" ")
    char_ids = {c: i for i, c in enumerate(alphabet)}

    # Word ids = the ARPA's unigram entries in sorted order (includes <s>, </s>, <unk>).
    unigrams = sorted(model._log_probs[0].keys())
    word_id = {gram[0]: i for i, gram in enumerate(unigrams)}
    vocab_size = len(unigrams)
    bos_id, unk_id = word_id[BOS], word_id[UNK]

    # Character trie over the decodable vocabulary.
    transitions: List[np.ndarray] = [np.full(len(alphabet), EMPTY, np.int32)]  # root
    node_word: List[int] = [-1]
    for word in sorted(model.vocabulary):
        if not word or any(c not in char_ids or c == " " for c in word):
            continue
        node = 0
        for c in word:
            nxt = transitions[node][char_ids[c]]
            if nxt == EMPTY:
                transitions.append(np.full(len(alphabet), EMPTY, np.int32))
                node_word.append(-1)
                nxt = len(transitions) - 1
                transitions[node][char_ids[c]] = nxt
            node = int(nxt)
        node_word[node] = word_id[word]

    uni_logp = np.full(vocab_size, -99.0, np.float32)
    uni_bo = np.zeros(vocab_size, np.float32)
    for gram, logp in model._log_probs[0].items():
        uni_logp[word_id[gram[0]]] = logp
    for gram, bo in model._backoffs[0].items():
        if len(gram) == 1:
            uni_bo[word_id[gram[0]]] = bo

    def ids(gram):
        return [word_id[w] for w in gram]

    bi_entries = [(ids(g), p, model._backoffs[1].get(g, 0.0) if model.order >= 2 else 0.0)
                  for g, p in (model._log_probs[1].items() if model.order >= 2 else [])]
    bi_keys = np.asarray([e[0] for e in bi_entries], np.int32).reshape(-1, 2)
    bi_k, (bi_logp, bi_bo), bi_probes = _build_hash_table(
        bi_keys, [np.asarray([e[1] for e in bi_entries], np.float32),
                  np.asarray([e[2] for e in bi_entries], np.float32)])

    tri_entries = list(model._log_probs[2].items()) if model.order >= 3 else []
    tri_keys = np.asarray([ids(g) for g, _ in tri_entries], np.int32).reshape(-1, 3)
    tri_k, (tri_logp,), tri_probes = _build_hash_table(
        tri_keys, [np.asarray([p for _, p in tri_entries], np.float32)])

    return DeviceWordLm(
        trie=np.stack(transitions), node_word=np.asarray(node_word, np.int32),
        uni_logp=uni_logp, uni_bo=uni_bo,
        bi_k=bi_k, bi_logp=bi_logp, bi_bo=bi_bo,
        tri_k=tri_k, tri_logp=tri_logp,
        max_probes=max(bi_probes, tri_probes),
        bos_id=bos_id, unk_id=unk_id, space_index=space_index)


# -- device-side lookups (jnp; shapes are vectors over beams) ----------------------------

def _probe2(lm: DeviceWordLm, k1, k2):
    """Vectorized 2-choice lookup in the bigram table: (logp, backoff, hit).
    Exactly two key probes (cuckoo layout), then ONE value gather at the match."""
    import jax.numpy as jnp

    size = lm.bi_k.shape[0]
    k1u, k2u = k1.astype(jnp.uint32), k2.astype(jnp.uint32)
    slot_a = ((k1u * _MIXES[0][0] ^ k2u * _MIXES[0][1]) % jnp.uint32(size)).astype(jnp.int32)
    slot_b = ((k1u * _MIXES[1][0] ^ k2u * _MIXES[1][1]) % jnp.uint32(size)).astype(jnp.int32)
    match_a = (lm.bi_k[slot_a, 0] == k1) & (lm.bi_k[slot_a, 1] == k2)
    match_b = (lm.bi_k[slot_b, 0] == k1) & (lm.bi_k[slot_b, 1] == k2)
    hit = match_a | match_b
    idx = jnp.where(match_a, slot_a, slot_b)
    logp = jnp.where(hit, lm.bi_logp[idx], 0.0)
    bo = jnp.where(hit, lm.bi_bo[idx], 0.0)
    return logp, bo, hit


def _probe3(lm: DeviceWordLm, k1, k2, k3):
    import jax.numpy as jnp

    size = lm.tri_k.shape[0]
    k1u, k2u, k3u = (k1.astype(jnp.uint32), k2.astype(jnp.uint32),
                     k3.astype(jnp.uint32))
    slot_a = ((k1u * _MIXES[0][0] ^ k2u * _MIXES[0][1] ^ k3u * _MIXES[0][2])
              % jnp.uint32(size)).astype(jnp.int32)
    slot_b = ((k1u * _MIXES[1][0] ^ k2u * _MIXES[1][1] ^ k3u * _MIXES[1][2])
              % jnp.uint32(size)).astype(jnp.int32)
    match_a = (lm.tri_k[slot_a, 0] == k1) & (lm.tri_k[slot_a, 1] == k2) \
        & (lm.tri_k[slot_a, 2] == k3)
    match_b = (lm.tri_k[slot_b, 0] == k1) & (lm.tri_k[slot_b, 1] == k2) \
        & (lm.tri_k[slot_b, 2] == k3)
    hit = match_a | match_b
    idx = jnp.where(match_a, slot_a, slot_b)
    logp = jnp.where(hit, lm.tri_logp[idx], 0.0)
    return logp, hit


def score_word_device(lm: DeviceWordLm, c1, c2, w):
    """log10 P(w | c1, c2) with Katz backoff — `ArpaLanguageModel._score` as gathers.
    All arguments are int32 word-id vectors (context registers start as (BOS, BOS))."""
    import jax.numpy as jnp

    uni = lm.uni_logp[w]
    bo1 = lm.uni_bo[c2]
    bi_logp, _, bi_hit = _probe2(lm, c2, w)
    bi_score = jnp.where(bi_hit, bi_logp, bo1 + uni)
    tri_logp, tri_hit = _probe3(lm, c1, c2, w)
    _, bo2, _ = _probe2(lm, c1, c2)  # missing context -> backoff 0 (probe returns 0)
    return jnp.where(tri_hit, tri_logp, bo2 + bi_score)
