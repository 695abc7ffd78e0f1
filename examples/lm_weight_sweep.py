"""Decoder-weight sweep on a trained hard-tier checkpoint (decode-only, CPU-friendly).

The reference hardcodes the KenLM-fork decoder weights (kenlm_weight=.8,
word_count_weight=0, valid_word_count_weight=2.3; `net.py:449-451`) — values tuned for
LibriSpeech + a large KenLM. On the hard-tier synthetic corpus the word trigram is
estimated from 900 training transcripts, so the optimal fusion weights differ. This
script regenerates the (deterministic) hard-tier corpus in an isolated data dir, loads
a trained checkpoint, runs the acoustic forward pass ONCE over the held-out test split,
and then sweeps (LM order, beam width, lm_weight, valid_word_count_weight) through the
host prefix-beam decoder on the cached posteriors — so a 40-point grid costs one forward
pass plus pure decode time.

Run (CPU is fine; the forward pass is the only heavy step):

    python examples/lm_weight_sweep.py \
        --nets-dir /tmp/speechless-quality/nets/quality-english-devres-hard-0f934087 \
        --epoch 40
"""
import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root import


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-sweep"))
    parser.add_argument("--nets-dir", type=Path, required=True,
                        help="run directory holding weights-epoch{n}.npz")
    parser.add_argument("--epoch", type=int, required=True)
    parser.add_argument("--utterances", type=int, default=1000)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="hard")
    parser.add_argument("--orders", type=int, nargs="+", default=[3, 4])
    parser.add_argument("--beam-widths", type=int, nargs="+", default=[25, 100])
    parser.add_argument("--lm-weights", type=float, nargs="+",
                        default=[0.8, 1.2, 1.6, 2.0, 2.4])
    parser.add_argument("--valid-word-count-weights", type=float, nargs="+",
                        default=[2.3, 4.0])
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu",
                        help="backend for the single forward pass (the sweep itself is "
                             "host-side C++ decode either way)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "LM_SWEEP_r03.json")
    args = parser.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from speechless_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()
    import math
    import numpy as np
    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory
    from speechless_tpu.lm.ngram import load_language_model
    from speechless_tpu.ops.decode import beam_search_decode
    from speechless_tpu.system import Wav2Letter
    from speechless_tpu.text.metrics import (ExpectationVsPrediction,
                                             ExpectationsVsPredictions)
    from speechless_tpu.utils.tools import log

    directories = DataDirectories(args.data_dir)
    corpus_name = ("synthetic" if args.difficulty == "standard"
                   else "synthetic-" + args.difficulty)
    generate_corpus(directories.corpus_base_directory / "English", corpus_name,
                    utterance_count=args.utterances, seed=0, difficulty=args.difficulty)
    config = Configuration(
        name="English",
        corpus_from_directory=lambda d: LibriSpeechCorpus(
            base_directory=d, corpus_name=corpus_name,
            training_test_split=TrainingTestSplit.randomly(0.9)),
        directories=directories)
    config.fill_cache()

    lm_dirs = {}
    for order in args.orders:
        lm_dir = directories.kenlm_base_directory / "english-o{}".format(order)
        build_kenlm_directory((e.label for e in config.corpus.training_examples), lm_dir,
                              allowed_characters=config.allowed_characters, order=order)
        lm_dirs[order] = lm_dir

    w2l = Wav2Letter(config.mel_frequency_count,
                     allowed_characters=config.allowed_characters,
                     load_model_from_directory=args.nets_dir, load_epoch=args.epoch,
                     allowed_characters_for_loaded_model=None)
    encoding = w2l.grapheme_encoding
    blank = encoding.grapheme_set_size - 1

    # -- one forward pass over the test split, posteriors cached on host -----
    cached = []  # (log_probs, lengths, expected_labels)
    t0 = time.time()
    for batch in config.batch_generator.test_batches():
        prepared, expected = w2l._prepare_batch(batch, for_training=False)
        log_probs, lengths, _ = w2l._eval_step(w2l.state.params, prepared)
        cached.append((np.asarray(log_probs), np.asarray(lengths), expected))
    log("forward pass: {} batches in {:.1f}s".format(len(cached), time.time() - t0))

    def score(decode_batch):
        results = []
        for log_probs, lengths, expected in cached:
            for predicted, exp in zip(decode_batch(log_probs, lengths), expected):
                results.append(ExpectationVsPrediction(
                    predicted=predicted, expected=exp, loss=0.0))
        r = ExpectationsVsPredictions(results)
        return (r.average_letter_error_rate, r.average_word_error_rate, len(results))

    def greedy_batch(log_probs, lengths):
        return w2l._greedy_decode_tokens(log_probs, lengths)

    def beam_batch_fn(lm, width, lm_weight, vwc_weight):
        def decode_batch(log_probs, lengths):
            tokens, counts = beam_search_decode(
                log_probs, list(lengths), blank=blank, beam_width=width,
                alphabet=encoding.allowed_characters, lm=lm, lm_weight=lm_weight,
                word_count_weight=0.0, valid_word_count_weight=vwc_weight,
                prune_log_prob_floor=math.log(1e-5))
            tokens = np.where(tokens < 0, blank, tokens)
            return encoding.decode_grapheme_batch(tokens, list(counts),
                                                  merge_repeated=False)
        return decode_batch

    out = {"checkpoint": str(args.nets_dir), "epoch": args.epoch,
           "difficulty": args.difficulty, "rows": []}
    ler, wer, n = score(greedy_batch)
    out["greedy"] = {"letter_error_rate": ler, "word_error_rate": wer, "examples": n}
    log("greedy: {:.2%} LER / {:.2%} WER over {} utts".format(ler, wer, n))

    lms = {order: load_language_model(lm_dir) for order, lm_dir in lm_dirs.items()}
    grid = list(itertools.product(args.orders, args.beam_widths, args.lm_weights,
                                  args.valid_word_count_weights))
    for order, width, lm_weight, vwc in grid:
        t0 = time.time()
        ler, wer, _ = score(beam_batch_fn(lms[order], width, lm_weight, vwc))
        row = {"order": order, "beam_width": width, "lm_weight": lm_weight,
               "valid_word_count_weight": vwc, "letter_error_rate": ler,
               "word_error_rate": wer, "decode_wall_s": round(time.time() - t0, 2)}
        out["rows"].append(row)
        log("order={} W={} lw={} vwc={}: {:.2%} LER / {:.2%} WER ({:.1f}s)".format(
            order, width, lm_weight, vwc, ler, wer, row["decode_wall_s"]))

    best = min(out["rows"], key=lambda r: r["letter_error_rate"])
    out["best"] = best
    out["beam_vs_greedy_ler_gap"] = (out["greedy"]["letter_error_rate"]
                                     / max(best["letter_error_rate"], 1e-12))
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(out, indent=2) + "\n")
    log("best: {} -> gap {:.2f}x; wrote {}".format(best, out["beam_vs_greedy_ler_gap"],
                                                   args.out))


if __name__ == "__main__":
    main()
