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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from quality_eval_common import (DECODE_WEIGHTS, add_common_args, aggregate,
                                 build_config, decode_test_set, load_word_lm)

from speechless_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--epochs", type=int, nargs="+", required=True,
                        help="epochs to evaluate, e.g. the final epoch and the "
                             "averaged write-epoch")
    args = parser.parse_args()

    enable_compilation_cache()

    import jax

    from speechless_tpu.ops.decode import greedy_decode
    from speechless_tpu.ops.decode_jax import beam_search_decode_jax
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
    config, directories = build_config(args)
    _, word_lm = load_word_lm(config, directories)
    blank = len(config.allowed_characters)

    results = {"run_name": args.run_name, "difficulty": args.difficulty,
               "beam_width": args.beam_width}
    for epoch in args.epochs:
        wav2letter = config.load_model(args.run_name, epoch,
                                       allowed_characters_for_loaded_model=None)
        expected, predictions, walls = decode_test_set(config, wav2letter, {
            "greedy": lambda log_probs, lengths: greedy_decode(
                log_probs, lengths, blank),
            "beam_lm": lambda log_probs, lengths: beam_search_decode_jax(
                log_probs, lengths, blank=blank, beam_width=args.beam_width,
                word_lm=word_lm, prune_classes=args.prune_classes,
                **DECODE_WEIGHTS),
        })
        epoch_results = {}
        for mode in predictions:
            aggregated = aggregate(expected, predictions[mode])
            epoch_results[mode] = {
                "letter_error_rate": aggregated.average_letter_error_rate,
                "word_error_rate": aggregated.average_word_error_rate,
                "decode_wall_s": round(walls[mode], 2),
                "wall_includes_compiles_and_rtt": True,
            }
            log("[epoch {} {}] LER {:.4f} WER {:.4f}".format(
                epoch, mode, aggregated.average_letter_error_rate,
                aggregated.average_word_error_rate))
        epoch_results["examples"] = len(expected)
        results["epoch_{}".format(epoch)] = epoch_results

    out = args.out or Path("averaging_results_{}.json".format(args.difficulty))
    out.write_text(json.dumps(results, indent=2))
    log("wrote {}".format(out))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
