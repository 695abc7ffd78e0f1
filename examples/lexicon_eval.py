"""Measure lexicon-constrained vs open-vocabulary device-beam decoding on a trained
quality checkpoint.

Run `examples/scaled_quality_eval.py` first (it trains the run and writes the corpus +
kenlm directory under ``--data-dir``); then:

    python examples/lexicon_eval.py --difficulty hard --run-name <run> --epoch 40 \
        --data-dir /tmp/speechless-quality --out evidence/LEXICON_r03.json

Both modes decode the SAME per-batch log-probs (one acoustic forward), so the deltas
isolate the decoder.
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
    parser.add_argument("--epoch", type=int, default=40)
    args = parser.parse_args()

    enable_compilation_cache()

    import jax

    from speechless_tpu.ops.decode_jax import beam_search_decode_jax
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
    config, directories = build_config(args)
    wav2letter = config.load_model(args.run_name, args.epoch,
                                   allowed_characters_for_loaded_model=None)
    arpa, word_lm = load_word_lm(config, directories)
    blank = len(config.allowed_characters)

    def beam(constrained):
        return lambda log_probs, lengths: beam_search_decode_jax(
            log_probs, lengths, blank=blank, beam_width=args.beam_width,
            word_lm=word_lm, prune_classes=args.prune_classes,
            lexicon_constrained=constrained, **DECODE_WEIGHTS)

    expected, predictions, walls = decode_test_set(
        config, wav2letter, {"beam_open": beam(False), "beam_lexicon": beam(True)})

    results = {"run_name": args.run_name, "epoch": args.epoch,
               "difficulty": args.difficulty, "beam_width": args.beam_width,
               "examples": len(expected),
               "vocabulary_words": len(arpa.vocabulary)}
    for name in predictions:
        aggregated = aggregate(expected, predictions[name])
        oov_words = sum(1 for p in predictions[name]
                        for word in p.split(" ") if word and word not in arpa.vocabulary)
        results[name] = {
            "letter_error_rate": aggregated.average_letter_error_rate,
            "word_error_rate": aggregated.average_word_error_rate,
            "emitted_oov_words": oov_words,
            "decode_wall_s": round(walls[name], 2),
            "wall_includes_compiles_and_rtt": True,
        }
        log("[{}] LER {:.4f} WER {:.4f} OOV words emitted {}".format(
            name, aggregated.average_letter_error_rate,
            aggregated.average_word_error_rate, oov_words))

    out = args.out or Path("lexicon_results_{}.json".format(args.difficulty))
    out.write_text(json.dumps(results, indent=2))
    log("wrote {}".format(out))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
