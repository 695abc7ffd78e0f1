"""LibriSpeech dress rehearsal: the reference's canonical entry point, end-to-end.

The reference's README flow (`/root/reference/README.md:23-27`) is::

    Configuration.minimal_english().train_from_beginning()

— fetch dev-clean from openslr.org, untar, parse, cache spectrograms, train, watch
training predictions converge; beam decoding then loads the model with
``use_kenlm=True`` (`english_corpus.py:315-333`, `net.py:417-423`). Network egress is
blocked in this image, so this script serves a REAL-LAYOUT ``dev-clean.tar.gz``
(``LibriSpeech/dev-clean/<speaker>/<chapter>/<id>.flac`` + per-chapter
``<speaker>-<chapter>.trans.txt`` with uppercase transcripts, FLAC encoded by the
in-repo encoder `features/flac_encoder.py`, decoded during training by the in-repo
C++ decoder `native/flac.cpp`) from a localhost ``http.server`` and points the
``SPEECHLESS_LIBRISPEECH_URL`` mirror override at it — the `Configuration` /
`LibriSpeechCorpus` entry points themselves run UNTOUCHED, byte-for-byte the
reference's flow from fetch to WER. Audio is the synthetic learnable corpus
(`data/synthetic.py`), so training converges in minutes instead of the reference's
"~12h on a strong consumer GPU".

    python examples/librispeech_dress_rehearsal.py            # TPU, ~10 min
    python examples/librispeech_dress_rehearsal.py --smoke    # tiny CPU smoke

Writes evidence to evidence/E2E_FETCH_r04.json.
"""
import argparse
import http.server
import json
import os
import shutil
import sys
import tarfile
import threading
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stage_dev_clean_archive(work: Path, utterances: int, seed: int = 0) -> Path:
    """Build ``dev-clean.tar.gz`` exactly as openslr ships it: a root ``LibriSpeech/``
    directory containing ``dev-clean/<speaker>/<chapter>/`` with FLAC audio and
    ``.trans.txt`` transcripts."""
    import numpy as np
    import scipy.io.wavfile as wavfile

    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.features.flac_encoder import encode_flac

    staging = work / "staging"
    source = generate_corpus(staging, corpus_name="dev-clean-src",
                             utterance_count=utterances, speaker_count=8,
                             min_duration_s=2.0, max_duration_s=5.0, seed=seed)
    tree = work / "tree" / "LibriSpeech" / "dev-clean"
    if tree.exists():
        shutil.rmtree(tree)
    for wav in sorted(source.rglob("*.wav")):
        chapter_dir = tree / wav.parent.relative_to(source / "all")
        chapter_dir.mkdir(parents=True, exist_ok=True)
        rate, samples = wavfile.read(str(wav))
        if samples.dtype != np.int16:
            samples = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
        # Plain Python ints: the encoder's bit arithmetic overflows on numpy int16.
        encode_flac(chapter_dir / (wav.stem + ".flac"), [samples.astype(int).tolist()],
                    sample_rate=rate)
    for trans in sorted(source.rglob("*.trans.txt")):
        if not trans.read_text().strip():
            continue  # speakers beyond utterance_count get an empty trans file
        target = tree / trans.parent.relative_to(source / "all") / trans.name
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(trans, target)
    serve_root = work / "serve"
    serve_root.mkdir(exist_ok=True)
    archive = serve_root / "dev-clean.tar.gz"
    with tarfile.open(str(archive), "w:gz") as tar:
        tar.add(str(work / "tree" / "LibriSpeech"), arcname="LibriSpeech")
    return archive


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=Path, default=Path("/tmp/speechless-e2e"))
    parser.add_argument("--utterances", type=int, default=240)
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU run (4 utterances, 1 epoch, 2 batches)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "E2E_FETCH_r04.json")
    args = parser.parse_args()

    import jax
    if args.smoke:
        args.utterances, args.epochs = 4, 1
        jax.config.update("jax_platforms", "cpu")
    else:
        from speechless_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()

    work = args.work_dir
    work.mkdir(parents=True, exist_ok=True)
    archive = stage_dev_clean_archive(work, args.utterances)
    print("staged {} ({} KiB)".format(archive, archive.stat().st_size // 1024),
          flush=True)

    handler = partial(http.server.SimpleHTTPRequestHandler,
                      directory=str(archive.parent))
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    os.environ["SPEECHLESS_LIBRISPEECH_URL"] = \
        "http://127.0.0.1:{}/".format(server.server_address[1])

    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.experiments import available_epochs
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory
    from speechless_tpu.utils.tools import log

    data_dir = work / "speechless-data"
    if data_dir.exists():
        shutil.rmtree(data_dir)  # the rehearsal must fetch, not reuse
    directories = DataDirectories(data_dir)
    configuration = Configuration.minimal_english(directories=directories)
    if args.smoke:
        configuration.training_batches_per_epoch = 2
        configuration.batch_size = 2

    # THE reference entry point, untouched (README.md:23-27) — fetches dev-clean
    # over HTTP from the mirror, untars, parses, caches, trains.
    t0 = time.time()
    configuration.train_from_beginning(epoch_limit=args.epochs)
    train_wall = time.time() - t0
    server.shutdown()

    assert (data_dir / "corpus" / "English" / "dev-clean.tar.gz").is_file(), \
        "the archive must have been fetched over HTTP"
    corpus = configuration.corpus
    runs = sorted((data_dir / "nets").iterdir())
    run_name = runs[-1].name
    epoch = available_epochs(data_dir / "nets" / run_name)[-1]
    log("trained run {} to epoch {} in {:.0f}s".format(run_name, epoch, train_wall))

    # The reference's KenLM beam decode: use_kenlm=True (net.py:417-423) with the
    # language model the in-repo Kneser-Ney builder produces for this configuration.
    build_kenlm_directory(
        [example.label for example in corpus.examples],
        directories.kenlm_base_directory / configuration.name.lower(),
        allowed_characters=configuration.allowed_characters, order=3)

    def evaluate(use_kenlm: bool) -> dict:
        model = configuration.load_model(
            load_name=run_name, load_epoch=epoch,
            allowed_characters_for_loaded_model=None, use_kenlm=use_kenlm)
        result = model.test_and_predict_batch(
            configuration.batch_generator.preview_batch())
        sample = result.results[0]
        return {"letter_error_rate": result.average_letter_error_rate,
                "word_error_rate": result.average_word_error_rate,
                "loss": result.average_loss,
                "sample": {"expected": sample.expected,
                           "predicted": sample.predicted}}

    greedy = evaluate(use_kenlm=False)
    beam = evaluate(use_kenlm=True)
    result = {
        "platform": jax.devices()[0].platform,
        "flow": "SPEECHLESS_LIBRISPEECH_URL=<localhost> "
                "Configuration.minimal_english().train_from_beginning() "
                "-> load_model(use_kenlm=True)",
        "archive_bytes": archive.stat().st_size,
        "fetched_archive": str(data_dir / "corpus" / "English" / "dev-clean.tar.gz"),
        "utterances": len(corpus.examples),
        "training_examples": len(corpus.training_examples),
        "epochs": epoch,
        "batches_per_epoch": configuration.training_batches_per_epoch,
        "batch_size": configuration.batch_size,
        "train_wall_s": round(train_wall, 1),
        "run_name": run_name,
        "greedy": greedy,
        "kenlm_beam": beam,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
