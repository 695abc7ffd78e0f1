"""Decode-path latency bench on real hardware: greedy vs beam variants (VERDICT #2/#5).

Measures, for a 64-utterance batch of trained-model-like (peaky) outputs at T'=512:
* on-device greedy decode,
* on-device prefix beam (no LM),
* on-device prefix beam with WORD-level n-gram fusion (HBM trie + hashed tables),
* host C++ prefix beam with the native ARPA scorer (the production eval path).

    python examples/bench_decode.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from speechless_tpu.data.synthetic import DEFAULT_VOCABULARY, _markov_successors, \
    sample_sentence
from speechless_tpu.lm.arpa_builder import WordNgramEstimator, build_kenlm_directory
from speechless_tpu.lm.device_lm import build_device_word_lm
from speechless_tpu.lm.ngram import ArpaLanguageModel, NativeArpaLanguageModel
from speechless_tpu.ops.decode import beam_search_decode, greedy_decode
from speechless_tpu.ops.decode_jax import beam_search_decode_jax
from speechless_tpu.ops.decode_pallas import beam_search_decode_pallas
from speechless_tpu.ops.decode_pallas_lm import (beam_search_decode_pallas_frames,
                                                 beam_search_decode_pallas_lm)

ALPHABET = list("abcdefghijklmnopqrstuvwxyz '")
BLANK = len(ALPHABET)
B, REPEATS = 64, 5


def peaky_batch(rng, t_max=512):
    """Trained-model-like outputs: strong peaks on a plausible character sequence."""
    successors = _markov_successors(DEFAULT_VOCABULARY, 6, seed=1)
    log_probs = np.zeros((B, t_max, BLANK + 1))
    for b in range(B):
        text = sample_sentence(rng, DEFAULT_VOCABULARY, successors, 18)[: t_max // 3]
        frames = []
        for c in text:
            frames += [ALPHABET.index(c), BLANK, BLANK]
        frames += [BLANK] * (t_max - len(frames))
        logits = rng.randn(t_max, BLANK + 1) * 1.0
        logits[np.arange(t_max), frames] += 7.0
        log_probs[b] = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return log_probs.astype(np.float32)


def timed(label, fn):
    fn()  # warm/compile
    times = []
    for _ in range(REPEATS):
        start = time.time()
        fn()
        times.append(time.time() - start)
    best = np.median(times)
    print("{:58s} {:8.1f} ms  ({:6.0f} utt/s)".format(label, best * 1000, B / best),
          flush=True)
    return best


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    log_probs = peaky_batch(rng)
    lengths = np.full(B, log_probs.shape[1], np.int32)

    lm_dir = Path("/tmp/speechless-bench-lm")
    build_kenlm_directory(
        [sample_sentence(rng, DEFAULT_VOCABULARY,
                         _markov_successors(DEFAULT_VOCABULARY, 6, seed=1), 20)
         for _ in range(500)], lm_dir, allowed_characters=ALPHABET, order=3)
    arpa = ArpaLanguageModel.load(lm_dir / "lm.arpa")
    device_lm = build_device_word_lm(arpa, ALPHABET).as_device()
    native = NativeArpaLanguageModel(lm_dir / "lm.arpa")
    print("word LM: {} unigrams, trie nodes {}, tri table {}, max probes {}".format(
        device_lm.uni_logp.shape[0], device_lm.trie.shape[0],
        device_lm.tri_k.shape[0], device_lm.max_probes), flush=True)

    dev_lp = jnp.asarray(log_probs)
    dev_len = jnp.asarray(lengths)

    timed("greedy (device)", lambda: np.asarray(
        greedy_decode(dev_lp, dev_len, BLANK)[0]))
    for width in (25, 100):
        timed("beam W={} no LM (device)".format(width), lambda w=width: np.asarray(
            beam_search_decode_jax(dev_lp, dev_len, BLANK, beam_width=w,
                                   max_decoded_length=256)[0]))
        timed("beam W={} no LM (device, prune 8)".format(width), lambda w=width: np.asarray(
            beam_search_decode_jax(dev_lp, dev_len, BLANK, beam_width=w,
                                   max_decoded_length=256, prune_classes=8)[0]))
        timed("beam W={} no LM (Pallas kernel, prune 8)".format(width),
              lambda w=width: np.asarray(
            beam_search_decode_pallas(dev_lp, dev_len, BLANK, beam_width=w,
                                      max_decoded_length=256, prune_classes=8)[0]))
        timed("beam W={} no LM (Pallas frames kernel, prune 8)".format(width),
              lambda w=width: np.asarray(
            beam_search_decode_pallas_frames(dev_lp, dev_len, BLANK, beam_width=w,
                                             max_decoded_length=256,
                                             prune_classes=8)[0]))
        timed("beam W={} word-LM fusion (device)".format(width), lambda w=width: np.asarray(
            beam_search_decode_jax(dev_lp, dev_len, BLANK, beam_width=w,
                                   max_decoded_length=256, word_lm=device_lm,
                                   lm_weight=0.8, valid_word_count_weight=2.3)[0]))
        timed("beam W={} word-LM fusion (device, prune 8)".format(width),
              lambda w=width: np.asarray(
            beam_search_decode_jax(dev_lp, dev_len, BLANK, beam_width=w,
                                   max_decoded_length=256, word_lm=device_lm,
                                   lm_weight=0.8, valid_word_count_weight=2.3,
                                   prune_classes=8)[0]))
        timed("beam W={} word-LM fusion (Pallas hybrid, prune 8)".format(width),
              lambda w=width: np.asarray(
            beam_search_decode_pallas_lm(dev_lp, dev_len, BLANK, word_lm=device_lm,
                                         beam_width=w, max_decoded_length=256,
                                         lm_weight=0.8, valid_word_count_weight=2.3,
                                         prune_classes=8)[0]))
        timed("beam W={} word-LM fusion (host C++, pruned)".format(width),
              lambda w=width: beam_search_decode(
                  log_probs, list(lengths), BLANK, beam_width=w, alphabet=ALPHABET,
                  lm=native, prune_log_prob_floor=np.log(1e-5)))


if __name__ == "__main__":
    main()
