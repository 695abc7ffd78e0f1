"""`mixed_german_english()` measured end-to-end (the last untested reference workflow).

The reference defines a mixed English+German configuration
(`/root/reference/speechless/configuration.py:88-94`: ComposedCorpus over both
language corpora, german charset — a superset of the english one) and a grouped
per-corpus evaluation workflow (`configuration.py:127-139`
`test_model_grouped_by_loaded_corpus_name`). This script trains ONE model on the
composed corpus (hard-tier synthetic English + German; the reference's real corpora
need network) and evaluates it grouped per language — per-corpus LER/WER from a
single mixed model, the `mixed_german_english` semantics end-to-end. (In the
reference this workflow could never actually run on the mixed configuration: its
grouping resolves example paths relative to the mixed corpus directory, which
contains no examples — ours falls back to the language directory.)

    python examples/mixed_quality_eval.py [--smoke]

Writes evidence to evidence/QUALITY_r04_mixed.json.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-mixed"))
    parser.add_argument("--utterances", type=int, default=500,
                        help="per language")
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--steps-per-epoch", type=int, default=100)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="hard")
    parser.add_argument("--clip-norm", type=float, default=1.0)
    parser.add_argument("--spec-augment", action="store_true", default=True)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "QUALITY_r04_mixed.json")
    args = parser.parse_args()

    import jax
    if args.smoke:
        args.utterances, args.epochs = 6, 1
        args.batch_size, args.steps_per_epoch = 2, 2
        jax.config.update("jax_platforms", "cpu")
    else:
        from speechless_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import ComposedCorpus, TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.system import Wav2Letter
    from speechless_tpu.text.charsets import german_frequent_characters
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
    directories = DataDirectories(args.data_dir)
    suffix = "" if args.difficulty == "standard" else "-" + args.difficulty

    # One synthetic corpus per language, in the language's own corpus directory —
    # the layout `english_corpus`/`german_corpus` produce, which the grouped eval
    # groups by. English text is valid in the german charset (a superset), matching
    # the reference's mixed configuration.
    generate_corpus(directories.corpus_base_directory / "English",
                    "synthetic" + suffix, utterance_count=args.utterances,
                    seed=0, difficulty=args.difficulty)
    generate_corpus(directories.corpus_base_directory / "German",
                    "synthetic-de" + suffix, utterance_count=args.utterances,
                    seed=100, characters=german_frequent_characters,
                    difficulty=args.difficulty)

    def language_corpus(language: str, corpus_name: str) -> LibriSpeechCorpus:
        return LibriSpeechCorpus(
            base_directory=directories.corpus_base_directory / language,
            corpus_name=corpus_name,
            allowed_characters=german_frequent_characters,
            training_test_split=TrainingTestSplit.randomly(0.9))

    # The `Configuration.mixed_german_english` semantics
    # (configuration.py:88-94 of the reference), with the synthetic corpus names.
    mixed = Configuration(
        name="mixed-English-German",
        allowed_characters=german_frequent_characters,
        corpus_from_directory=lambda _: ComposedCorpus(
            [language_corpus("English", "synthetic" + suffix),
             language_corpus("German", "synthetic-de" + suffix)]),
        directories=directories, batch_size=args.batch_size,
        training_batches_per_epoch=args.steps_per_epoch)
    log("mixed corpus: {} train / {} test".format(
        len(mixed.corpus.training_examples), len(mixed.corpus.test_examples)))
    t0 = time.time()
    mixed.fill_cache()
    log("cache fill: {:.1f}s".format(time.time() - t0))

    run_name = "quality-mixed{}".format(suffix)
    w2l_kwargs = dict(gradient_clip_norm=args.clip_norm,
                      spec_augment=args.spec_augment and not args.smoke)
    t0 = time.time()
    mixed.train_or_resume(run_name, wav2letter_kwargs=w2l_kwargs,
                          epoch_limit=args.epochs,
                          callback_step=max(1, args.epochs // 4),
                          device_resident=not args.smoke)
    train_wall = time.time() - t0

    model = mixed.load_model(load_name=run_name, load_epoch=args.epochs,
                             allowed_characters_for_loaded_model=None)
    t0 = time.time()
    grouped = mixed.test_model_grouped_by_loaded_corpus_name(model)
    eval_wall = time.time() - t0

    result = {
        "platform": jax.devices()[0].platform,
        "workflow": "Configuration(mixed-English-German) train_or_resume -> "
                    "test_model_grouped_by_loaded_corpus_name",
        "difficulty": args.difficulty,
        "utterances_per_language": args.utterances,
        "epochs": args.epochs,
        "spec_augment": w2l_kwargs["spec_augment"],
        "gradient_clip_norm": args.clip_norm,
        "train_wall_s": round(train_wall, 1),
        "eval_wall_s": round(eval_wall, 1),
        "per_corpus": {
            name: {"letter_error_rate": batches.average_letter_error_rate,
                   "word_error_rate": batches.average_word_error_rate,
                   "loss": batches.average_loss,
                   "examples": len(batches.results)}
            for name, batches in grouped.result_batches_by_group_name.items()},
        "all_corpora": {"letter_error_rate": grouped.average_letter_error_rate,
                        "word_error_rate": grouped.average_word_error_rate,
                        "examples": len(grouped.results)},
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
