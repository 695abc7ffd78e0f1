"""Shared scaffold for the decode-quality evidence scripts (`lexicon_eval.py`,
`averaging_eval.py`): corpus/config construction, the word-LM setup, and the
one-forward-many-decoders batch loop. The scripts vary only in WHICH decoders (or
which checkpoints) they compare — the recipe itself must live in one place so the
evidence stays comparable across scripts.

Run `examples/scaled_quality_eval.py` first: it trains the run and writes the corpus
and kenlm directory under ``--data-dir``.
"""
import argparse
import time
from pathlib import Path

DECODE_WEIGHTS = dict(lm_weight=0.8, word_count_weight=0.0,
                      valid_word_count_weight=2.3)  # the reference's net.py:449-451


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run-name", required=True,
                        help="trained run under nets/ (see the quality script's log)")
    parser.add_argument("--utterances", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="hard")
    parser.add_argument("--beam-width", type=int, default=25)
    parser.add_argument("--prune-classes", type=int, default=8)
    parser.add_argument("--out", type=Path, default=None)


def build_config(args):
    """The quality corpus + `Configuration` the run was trained on (regenerating the
    corpus is deterministic — ids hash the generation signature)."""
    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.synthetic import generate_corpus

    directories = DataDirectories(args.data_dir)
    corpus_name = ("synthetic" if args.difficulty == "standard"
                   else "synthetic-" + args.difficulty)
    generate_corpus(directories.corpus_base_directory / "English", corpus_name,
                    utterance_count=args.utterances, seed=0,
                    difficulty=args.difficulty)
    config = Configuration(
        name="English",
        corpus_from_directory=lambda d: LibriSpeechCorpus(
            base_directory=d, corpus_name=corpus_name,
            training_test_split=TrainingTestSplit.randomly(0.9)),
        directories=directories, batch_size=args.batch_size)
    config.fill_cache()
    return config, directories


def load_word_lm(config, directories):
    """(arpa, device word-LM) from the quality run's kenlm directory; exits with a
    pointer to the quality script when absent."""
    from speechless_tpu.lm.device_lm import build_device_word_lm
    from speechless_tpu.lm.ngram import load_language_model

    arpa = load_language_model(
        directories.kenlm_base_directory / config.name.lower(), prefer_native=False)
    if arpa is None:
        raise SystemExit("no ARPA model under {} — run the quality script first".format(
            directories.kenlm_base_directory))
    return arpa, build_device_word_lm(arpa, config.allowed_characters).as_device()


def decode_test_set(config, wav2letter, decoders: dict):
    """One acoustic forward per test batch, then every decoder over the SAME
    log-probs (so mode deltas isolate the decoder). ``decoders`` maps mode name to
    ``fn(log_probs, lengths) -> (tokens, counts)``. Returns
    ``(expected, {mode: predictions}, {mode: decode_wall_s})``."""
    import numpy as np

    from speechless_tpu.models import wav2letter as w2l

    codec = wav2letter.grapheme_encoding
    predictions = {name: [] for name in decoders}
    walls = {name: 0.0 for name in decoders}
    expected_all = []
    for batch in config.batch_generator.test_batches():
        device_batch, expected = wav2letter._prepare_batch(batch, for_training=False)
        expected_all.extend(expected)
        log_probs = wav2letter._forward_fn(wav2letter.state.params,
                                           device_batch.inputs)
        lengths = w2l.prediction_lengths(wav2letter.config,
                                         device_batch.input_lengths)
        for name, decode in decoders.items():
            t0 = time.time()
            tokens, counts = decode(log_probs, lengths)
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            walls[name] += time.time() - t0
            for row in range(len(expected)):
                predictions[name].append(codec.decode_graphemes(
                    tokens[row, : counts[row]].tolist(), merge_repeated=False))
    return expected_all, predictions, walls


def aggregate(expected, predicted):
    """LER/WER aggregation over (expected, predicted) transcript pairs."""
    from speechless_tpu.text.metrics import (ExpectationVsPrediction,
                                             ExpectationsVsPredictions)

    return ExpectationsVsPredictions(
        [ExpectationVsPrediction(expected=e, predicted=p, loss=0.0)
         for e, p in zip(expected, predicted)])
