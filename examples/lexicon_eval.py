"""Measure lexicon-constrained vs open-vocabulary device-beam decoding on a trained
quality checkpoint.

Run `examples/scaled_quality_eval.py` first (it trains the run and writes the corpus +
kenlm directory under ``--data-dir``); then:

    python examples/lexicon_eval.py --difficulty hard --run-name <run> --epoch 40 \
        --data-dir /tmp/speechless-quality --out evidence/LEXICON_r03.json

Both modes decode the SAME per-batch log-probs (one acoustic forward), so the deltas
isolate the decoder. Greedy rides along as the no-LM anchor.
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
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--utterances", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="hard")
    parser.add_argument("--beam-width", type=int, default=25)
    parser.add_argument("--prune-classes", type=int, default=8)
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.lm.device_lm import build_device_word_lm
    from speechless_tpu.lm.ngram import load_language_model
    from speechless_tpu.models import wav2letter as w2l
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

    wav2letter = config.load_model(args.run_name, args.epoch,
                                   allowed_characters_for_loaded_model=None)
    arpa = load_language_model(
        directories.kenlm_base_directory / config.name.lower(), prefer_native=False)
    if arpa is None:
        raise SystemExit("no ARPA model under {} — run the quality script first".format(
            directories.kenlm_base_directory))
    word_lm = build_device_word_lm(arpa, config.allowed_characters).as_device()
    blank = len(config.allowed_characters)
    codec = wav2letter.grapheme_encoding

    modes = {"beam_open": False, "beam_lexicon": True}
    predictions = {name: [] for name in modes}
    expected_all = []
    walls = {name: 0.0 for name in modes}
    weights = dict(lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3)

    for batch in config.batch_generator.test_batches():
        device_batch, expected = wav2letter._prepare_batch(batch, for_training=False)
        expected_all.extend(expected)
        log_probs = wav2letter._forward_fn(wav2letter.state.params, device_batch.inputs)
        lengths = w2l.prediction_lengths(wav2letter.config, device_batch.input_lengths)
        for name, constrained in modes.items():
            t0 = time.time()
            tokens, counts = beam_search_decode_jax(
                log_probs, lengths, blank=blank, beam_width=args.beam_width,
                word_lm=word_lm, prune_classes=args.prune_classes,
                lexicon_constrained=constrained, **weights)
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            walls[name] += time.time() - t0
            for row in range(len(expected)):
                predictions[name].append(codec.decode_graphemes(
                    tokens[row, : counts[row]].tolist(), merge_repeated=False))

    results = {"run_name": args.run_name, "epoch": args.epoch,
               "difficulty": args.difficulty, "beam_width": args.beam_width,
               "examples": len(expected_all),
               "vocabulary_words": len(arpa.vocabulary)}
    for name in modes:
        aggregated = ExpectationsVsPredictions(
            [ExpectationVsPrediction(expected=e, predicted=p, loss=0.0)
             for e, p in zip(expected_all, predictions[name])])
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
