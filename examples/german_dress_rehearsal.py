"""German dress rehearsal: the reference's German fetch flow, end-to-end.

The reference trains German by subclassing the LibriSpeech fetch machinery over ten
BAS Clarin corpora (scp from the BAS server; ``.par`` BAS-Partitur + EMU
``_annot.json`` annotations, per-corpus umlaut escapings, ALC label repair, VM1/VM2
id filters) plus the Voxforge German distribution (per-prompt XML, one wav per
microphone) — `/root/reference/speechless/german_corpus.py:47-418`. Round 4 left
this the only reference flow never run end-to-end (the parsers are fixture-tested
only). This rehearsal stages ALL ELEVEN archives in their real layouts, serves them
from a localhost ``http.server`` (the ``SPEECHLESS_CLARIN_URL`` /
``SPEECHLESS_VOXFORGE_URL`` mirror overrides), and runs

    Configuration.german(from_cached=False).train_from_beginning()

UNTOUCHED: fetch -> untar -> parse (umlauts, positional labels, ALC repair,
microphone fan-out, split strategies) -> cache -> train -> the reference's own
grouped held-out evaluation (`test_model_grouped_by_loaded_corpus_name`), greedy
and `use_kenlm=True` beam.

    python examples/german_dress_rehearsal.py            # TPU, ~20-40 min
    python examples/german_dress_rehearsal.py --smoke    # tiny CPU smoke

Writes evidence to evidence/E2E_FETCH_DE_r05.json.
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

from rehearsal_common import (serve_directory, stage_clarin_archive,
                              stage_voxforge_archive)

# Every corpus `clarin_corpora_sorted_by_size` composes, with its staging quirks:
# (archive name, utterances, seed, umlaut escaping, id prefix, ALC sibling pairs,
# positional _annot.json). VM1 ids must match [klmngzjw].*, VM2 ids g.*; ALC ids
# group by id[:3] for the split; SC1/SC10 are test-only corpora; PD2 and PD1
# additionally carry EMU _annot.json positional annotations.
CLARIN = [
    ("all.SC1.3.cmdi.15010.1490631864", 24, 21, "after", "sc1", False, False),
    ("all.PD2.4.cmdi.16693.1490681127", 48, 22, "before", "pd2", False, True),
    ("all.ZIPTEL.3.cmdi.63058.1490624016", 48, 23, "before", "zip", False, False),
    ("all.SC10.4.cmdi.13781.1490631055", 24, 24, "after", "sc10", False, False),
    ("all.HEMPEL.4.cmdi.11610.1490680796", 48, 25, "before", "hem", False, False),
    ("all.PD1.3.cmdi.16312.1490681066", 48, 26, "before", "pd1", False, True),
    ("all.VM1.3.cmdi.1508.1490625070", 48, 27, "before", "k", False, False),
    ("all.RVG-J.1.cmdi.18181.1490681704", 48, 28, "before", "rvg", False, False),
    ("all.ALC.4.cmdi.16602.1490632862", 24, 29, "before", "", True, False),
    ("all.VM2.3.cmdi.4260.1490625316", 48, 30, "before", "g", False, False),
]
VOXFORGE_PROMPTS = 40


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=Path,
                        default=Path("/tmp/speechless-e2e-german"))
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU run (4 utterances per archive, 1 epoch)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "E2E_FETCH_DE_r05.json")
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
    t_stage = time.time()
    staged = {}
    for name, utterances, seed, escape, prefix, alc, positional in CLARIN:
        if args.smoke:
            utterances = 8 if alc or name.startswith(("all.SC", "all.PD2")) else 6
        archive = stage_clarin_archive(work, name, utterances, seed,
                                       escape=escape, id_prefix=prefix,
                                       alc_pairs=alc, positional_json=positional)
        staged[name] = utterances * (2 if alc else 1)
        print("staged {} ({} KiB)".format(archive, archive.stat().st_size // 1024),
              flush=True)
    prompts = 6 if args.smoke else VOXFORGE_PROMPTS
    archive = stage_voxforge_archive(work, prompts, seed=31)
    staged["german-speechdata-package-v2"] = prompts * 2  # two microphones
    print("staged {} ({} KiB)".format(archive, archive.stat().st_size // 1024),
          flush=True)
    stage_wall = time.time() - t_stage

    server, url = serve_directory(work / "serve")
    os.environ["SPEECHLESS_CLARIN_URL"] = url
    os.environ["SPEECHLESS_VOXFORGE_URL"] = url

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.experiments import available_epochs
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory
    from speechless_tpu.utils.tools import log

    data_dir = work / "speechless-data"
    if data_dir.exists():
        shutil.rmtree(data_dir)  # the rehearsal must fetch, not reuse
    directories = DataDirectories(data_dir)
    configuration = Configuration.german(from_cached=False,
                                         directories=directories)
    if args.smoke:
        configuration.training_batches_per_epoch = 2
        configuration.batch_size = 2

    # The reference's pre-training bookkeeping: per-corpus stats + corpus.csv (the
    # cached-corpus file `Configuration.german(from_cached=True)` reloads).
    configuration.summarize_and_save_corpus()
    corpus = configuration.corpus
    assert len(corpus.corpora) == 11, "all eleven corpora must compose"
    parse_counts = {c.corpus_name: len(c.examples) for c in corpus.corpora}

    # THE reference entry point, untouched — fetches all eleven archives over HTTP
    # from the mirrors, untars, parses, composes, caches, trains.
    t0 = time.time()
    configuration.train_from_beginning(
        wav2letter_kwargs=None if args.smoke else {"gradient_clip_norm": 1.0},
        epoch_limit=args.epochs, device_resident=not args.smoke)
    train_wall = time.time() - t0
    server.shutdown()

    for name in staged:
        extension = (".tar.gz" if name == "german-speechdata-package-v2"
                     else ".tgz")
        fetched = data_dir / "corpus" / "German" / (name + extension)
        assert fetched.is_file(), "{} must have been fetched over HTTP".format(name)

    runs = sorted((data_dir / "nets").iterdir())
    run_name = runs[-1].name
    epoch = available_epochs(data_dir / "nets" / run_name)[-1]
    log("trained run {} to epoch {} in {:.0f}s".format(run_name, epoch, train_wall))

    build_kenlm_directory(
        [example.label for example in corpus.training_examples],
        directories.kenlm_base_directory / configuration.name.lower(),
        allowed_characters=configuration.allowed_characters, order=3)

    def evaluate(use_kenlm: bool) -> dict:
        model = configuration.load_model(
            load_name=run_name, load_epoch=epoch,
            allowed_characters_for_loaded_model=None, use_kenlm=use_kenlm)
        grouped = configuration.test_model_grouped_by_loaded_corpus_name(model)
        by_corpus = {
            name: {"letter_error_rate": batches.average_letter_error_rate,
                   "word_error_rate": batches.average_word_error_rate,
                   "examples": len(batches.results)}
            for name, batches in grouped.result_batches_by_group_name.items()
            if batches.results}
        return {"letter_error_rate": grouped.average_letter_error_rate,
                "word_error_rate": grouped.average_word_error_rate,
                "loss": grouped.average_loss, "by_corpus": by_corpus}

    greedy = evaluate(use_kenlm=False)
    beam = evaluate(use_kenlm=True)
    result = {
        "platform": jax.devices()[0].platform,
        "flow": "SPEECHLESS_CLARIN_URL/SPEECHLESS_VOXFORGE_URL=<localhost> "
                "Configuration.german(from_cached=False)"
                ".summarize_and_save_corpus() + .train_from_beginning() -> "
                "test_model_grouped_by_loaded_corpus_name(use_kenlm=True)",
        "staged_utterances": staged,
        "parse_counts": parse_counts,
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
