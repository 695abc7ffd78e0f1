"""Measure checkpoint averaging: decode quality of a uniformly averaged last-K
checkpoint vs the single final checkpoint of the same run.

Run `examples/scaled_quality_eval.py` first (it trains the run and writes the corpus +
kenlm directory under ``--data-dir``), then average (or let this script do it):

    python -m speechless_tpu average --config english --data-dir /tmp/speechless-quality \
        --run <run> --last 5
    python examples/averaging_eval.py --difficulty hard --run-name <run> \
        --epochs 40 1040 --data-dir /tmp/speechless-quality --out evidence/AVERAGING_r03.json

Every epoch decodes the SAME test batches greedy + word-LM beam, so the deltas isolate
the weights. Checkpoint averaging is the standard production-ASR smoothing step
(wav2letter++ / ESPnet recipes); the reference always decodes the single last epoch
(`/root/reference/speechless/net.py:558-572`).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from speechless_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run-name", required=True,
                        help="trained run under nets/ (see the quality script's log)")
    parser.add_argument("--epochs", type=int, nargs="+", required=True,
                        help="epochs to evaluate, e.g. the final epoch and the "
                             "averaged write-epoch")
    parser.add_argument("--utterances", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="hard")
    parser.add_argument("--beam-width", type=int, default=25)
    parser.add_argument("--prune-classes", type=int, default=8)
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    enable_compilation_cache()

    import jax
    import numpy as np

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.lm.device_lm import build_device_word_lm
    from speechless_tpu.lm.ngram import load_language_model
    from speechless_tpu.models import wav2letter as w2l
    from speechless_tpu.ops.decode import greedy_decode
    from speechless_tpu.ops.decode_jax import beam_search_decode_jax
    from speechless_tpu.text.metrics import (ExpectationVsPrediction,
                                             ExpectationsVsPredictions)
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
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
        directories=directories, batch_size=args.batch_size)
    config.fill_cache()

    arpa = load_language_model(
        directories.kenlm_base_directory / config.name.lower(), prefer_native=False)
    if arpa is None:
        raise SystemExit("no ARPA model under {} — run the quality script first".format(
            directories.kenlm_base_directory))
    word_lm = build_device_word_lm(arpa, config.allowed_characters).as_device()
    blank = len(config.allowed_characters)
    weights = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)

    results = {"run_name": args.run_name, "difficulty": args.difficulty,
               "beam_width": args.beam_width}
    for epoch in args.epochs:
        wav2letter = config.load_model(args.run_name, epoch,
                                       allowed_characters_for_loaded_model=None)
        codec = wav2letter.grapheme_encoding
        decoded = {"greedy": [], "beam_lm": []}
        expected_all = []
        walls = {"greedy": 0.0, "beam_lm": 0.0}
        for batch in config.batch_generator.test_batches():
            device_batch, expected = wav2letter._prepare_batch(batch, for_training=False)
            expected_all.extend(expected)
            log_probs = wav2letter._forward_fn(wav2letter.state.params,
                                               device_batch.inputs)
            lengths = w2l.prediction_lengths(wav2letter.config,
                                             device_batch.input_lengths)
            t0 = time.time()
            tokens, counts = greedy_decode(log_probs, lengths, blank)
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            walls["greedy"] += time.time() - t0
            for row in range(len(expected)):
                decoded["greedy"].append(codec.decode_graphemes(
                    tokens[row, : counts[row]].tolist(), merge_repeated=False))
            t0 = time.time()
            tokens, counts = beam_search_decode_jax(
                log_probs, lengths, blank=blank, beam_width=args.beam_width,
                word_lm=word_lm, prune_classes=args.prune_classes, **weights)
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            walls["beam_lm"] += time.time() - t0
            for row in range(len(expected)):
                decoded["beam_lm"].append(codec.decode_graphemes(
                    tokens[row, : counts[row]].tolist(), merge_repeated=False))
        epoch_results = {}
        for mode, predictions in decoded.items():
            aggregated = ExpectationsVsPredictions(
                [ExpectationVsPrediction(expected=e, predicted=p, loss=0.0)
                 for e, p in zip(expected_all, predictions)])
            epoch_results[mode] = {
                "letter_error_rate": aggregated.average_letter_error_rate,
                "word_error_rate": aggregated.average_word_error_rate,
                "decode_wall_s": round(walls[mode], 2),
                "wall_includes_compiles_and_rtt": True,
            }
            log("[epoch {} {}] LER {:.4f} WER {:.4f}".format(
                epoch, mode, aggregated.average_letter_error_rate,
                aggregated.average_word_error_rate))
        epoch_results["examples"] = len(expected_all)
        results["epoch_{}".format(epoch)] = epoch_results

    out = args.out or Path("averaging_results_{}.json".format(args.difficulty))
    out.write_text(json.dumps(results, indent=2))
    log("wrote {}".format(out))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
