"""Full `english()` dress rehearsal: the reference's PRODUCTION flow, end-to-end.

The reference's production training path is a ComposedCorpus over the six
LibriSpeech archives — dev-clean, dev-other, train-clean-100/360, train-other-500
as training corpora and test-clean as the held-out test split
(`/root/reference/speechless/english_corpus.py:315-329`,
`/root/reference/speechless/corpus.py:125-144`). Round 4's rehearsal ran
`minimal_english()` against ONE archive and scored the training preview batch;
this one exercises everything that flow did not:

- SIX real-layout archives fetched over HTTP (multi-archive ComposedCorpus),
- `summarize_and_save_corpus` (per-corpus stats summary + corpus.csv),
- `Configuration.english().train_from_beginning()` UNTOUCHED,
- **held-out** test-clean evaluation via the reference's own
  `test_model_grouped_by_loaded_corpus_name` workflow, greedy and
  `use_kenlm=True` beam (LM built from TRAINING transcripts only — no test
  leakage).

Audio is hard-tier synthetic (`data/synthetic.py`, the tier calibrated in round 3
to keep greedy decoding in the low-percent band instead of memorizing), so the
held-out numbers are non-trivial: a model that did not generalize would score
tens of percent here.

    python examples/english_dress_rehearsal.py            # TPU, ~30-60 min
    python examples/english_dress_rehearsal.py --smoke    # tiny CPU smoke

Writes evidence to evidence/E2E_FETCH_r05.json.
"""
import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rehearsal_common import serve_directory, stage_librispeech_archive

# (corpus_name, utterances, seed): >=2k training utterances over five archives +
# a held-out test-clean. Distinct seeds give distinct utterances and example ids.
ARCHIVES = [("dev-clean", 160, 11), ("dev-other", 160, 12),
            ("train-clean-100", 640, 13), ("train-clean-360", 720, 14),
            ("train-other-500", 560, 15), ("test-clean", 240, 16)]
SMOKE_ARCHIVES = [(name, 4, seed) for name, _, seed in ARCHIVES]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=Path,
                        default=Path("/tmp/speechless-e2e-english"))
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--difficulty", default="hard")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU run (4 utterances per archive, 1 epoch)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "E2E_FETCH_r05.json")
    args = parser.parse_args()

    import jax
    if args.smoke:
        args.epochs = 1
        jax.config.update("jax_platforms", "cpu")
    else:
        from speechless_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()

    work = args.work_dir
    work.mkdir(parents=True, exist_ok=True)
    archives = SMOKE_ARCHIVES if args.smoke else ARCHIVES
    t_stage = time.time()
    for name, utterances, seed in archives:
        # Non-standard tiers hash the generation signature into the chapter field,
        # which keeps example ids unique ACROSS archives (standard-tier corpora all
        # use chapter "1", so a multi-archive ComposedCorpus would see duplicates).
        archive = stage_librispeech_archive(work, name, utterances, seed,
                                            difficulty=args.difficulty)
        print("staged {} ({} KiB)".format(archive, archive.stat().st_size // 1024),
              flush=True)
    stage_wall = time.time() - t_stage

    server, url = serve_directory(work / "serve")
    os.environ["SPEECHLESS_LIBRISPEECH_URL"] = url

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.experiments import available_epochs
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory
    from speechless_tpu.utils.tools import log

    data_dir = work / "speechless-data"
    if data_dir.exists():
        shutil.rmtree(data_dir)  # the rehearsal must fetch, not reuse
    directories = DataDirectories(data_dir)
    configuration = Configuration.english(directories=directories)
    if args.smoke:
        configuration.training_batches_per_epoch = 2
        configuration.batch_size = 2

    # The reference's pre-training corpus bookkeeping (`main.py` invokes it before
    # long runs): per-corpus stats logged + summary.csv + corpus.csv.
    configuration.summarize_and_save_corpus()
    corpus = configuration.corpus
    assert len(corpus.corpora) == len(archives), "all archives must compose"

    # THE reference production entry point, untouched — fetches all six archives
    # over HTTP from the mirror, untars, parses, composes, caches, trains.
    # (`gradient_clip_norm` hardening per the round-3 hard-tier calibration;
    # device_resident is this framework's TPU-native epoch loop.)
    t0 = time.time()
    configuration.train_from_beginning(
        wav2letter_kwargs=None if args.smoke else {"gradient_clip_norm": 1.0},
        epoch_limit=args.epochs, device_resident=not args.smoke)
    train_wall = time.time() - t0
    server.shutdown()

    for name, _, _ in archives:
        fetched = data_dir / "corpus" / "English" / (name + ".tar.gz")
        assert fetched.is_file(), "{} must have been fetched over HTTP".format(name)
    assert (configuration.corpus_directory / "summary.csv").is_file()
    assert (configuration.corpus_directory / "corpus.csv").is_file()

    runs = sorted((data_dir / "nets").iterdir())
    run_name = runs[-1].name
    epoch = available_epochs(data_dir / "nets" / run_name)[-1]
    log("trained run {} to epoch {} in {:.0f}s".format(run_name, epoch, train_wall))

    # KenLM-equivalent beam LM from TRAINING transcripts only: test-clean text must
    # stay held out of the LM too (`net.py:417-423` loads an external LM).
    build_kenlm_directory(
        [example.label for example in corpus.training_examples],
        directories.kenlm_base_directory / configuration.name.lower(),
        allowed_characters=configuration.allowed_characters, order=3)

    def evaluate(use_kenlm: bool) -> dict:
        model = configuration.load_model(
            load_name=run_name, load_epoch=epoch,
            allowed_characters_for_loaded_model=None, use_kenlm=use_kenlm)
        # The reference's own held-out workflow: grouped by source corpus; only
        # test-clean contributes test examples (the training archives are
        # training_only), so this IS the held-out test-clean evaluation.
        grouped = configuration.test_model_grouped_by_loaded_corpus_name(model)
        return {"letter_error_rate": grouped.average_letter_error_rate,
                "word_error_rate": grouped.average_word_error_rate,
                "loss": grouped.average_loss}

    greedy = evaluate(use_kenlm=False)
    beam = evaluate(use_kenlm=True)
    result = {
        "platform": jax.devices()[0].platform,
        "flow": "SPEECHLESS_LIBRISPEECH_URL=<localhost> "
                "Configuration.english().summarize_and_save_corpus() + "
                ".train_from_beginning() -> "
                "test_model_grouped_by_loaded_corpus_name(use_kenlm=True)",
        "difficulty": "standard" if args.smoke else args.difficulty,
        "archives": {name: utts for name, utts, _ in archives},
        "utterances": len(corpus.examples),
        "training_examples": len(corpus.training_examples),
        "heldout_test_examples": len(corpus.test_examples),
        "epochs": epoch,
        "batches_per_epoch": configuration.training_batches_per_epoch,
        "batch_size": configuration.batch_size,
        "stage_wall_s": round(stage_wall, 1),
        "train_wall_s": round(train_wall, 1),
        "run_name": run_name,
        "heldout_greedy": greedy,
        "heldout_kenlm_beam": beam,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
