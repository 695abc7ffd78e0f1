"""Int8-quantized serving accuracy: LER/WER delta vs full-precision on a trained run.

Loads the hard-tier checkpoint trained by examples/scaled_quality_eval.py, rebuilds the
held-out test split deterministically, and transcribes the same utterances through the
full-precision, int8 weight-quantized (dequant-bf16 compute), and int8 MXU-compute
(`int8_compute=True`: int8 x int8 -> int32 convs for the wide tail, v5e 394 int8 TOPS)
`Transcriber`s. Writes a JSON row with error rates, steady-state batched throughput
(utt/s with warm programs), and per-utterance disagreement counts — the accuracy +
throughput evidence for the quantized serving modes.

    python examples/quantized_serving_eval.py --utterances 100          # TPU
    python examples/quantized_serving_eval.py --utterances 20 --platform cpu
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run", default="quality-english-devres-hard-0f934087-sa")
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--utterances", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--difficulty", default="hard")
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "QUANT_r04.json")
    args = parser.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from speechless_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()

    import numpy as np

    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.features.audio_io import load_audio
    from speechless_tpu.models.quantize import quantization_error
    from speechless_tpu.serving import Transcriber
    from speechless_tpu.text.charsets import english_frequent_characters
    from speechless_tpu.text.metrics import levenshtein
    from speechless_tpu.train.checkpoint import load_params
    from speechless_tpu.utils.tools import log

    corpus_name = ("synthetic" if args.difficulty == "standard"
                   else "synthetic-" + args.difficulty)
    corpus = LibriSpeechCorpus(
        base_directory=args.data_dir / "corpus" / "English", corpus_name=corpus_name,
        training_test_split=TrainingTestSplit.randomly(0.9))
    examples = corpus.test_examples[: args.utterances]
    log("evaluating {} held-out utterances".format(len(examples)))
    audios = [load_audio(e.audio_file, 16000) for e in examples]
    labels = [e.label for e in examples]

    net_directory = args.data_dir / "nets" / args.run
    params = load_params(net_directory, args.epoch)
    rows = {}
    predictions = {}
    from speechless_tpu.models.wav2letter import Wav2LetterConfig
    config = Wav2LetterConfig(input_size_per_time_step=128,
                              grapheme_set_size=len(english_frequent_characters) + 1)
    for label_key, kwargs in (("float32", {}),
                              ("int8", {"quantize_weights": True}),
                              ("int8_mxu", {"int8_compute": True})):
        transcriber = Transcriber(config, params, english_frequent_characters,
                                  **kwargs)
        start = time.time()
        results = transcriber.transcribe_batch(audios, batch_size=args.batch_size)
        wall = time.time() - start
        # Steady-state offline throughput: a second pass over the same utterances
        # with every bucket program already compiled (the first pass's wall mixes
        # in remote compiles; on a tunneled chip those take minutes cold).
        start = time.time()
        transcriber.transcribe_batch(audios, batch_size=args.batch_size)
        warm_wall = time.time() - start
        texts = [text for text, _ in results]
        predictions[label_key] = texts
        letter_errors = sum(levenshtein(label, text)
                            for label, text in zip(labels, texts))
        word_errors = sum(levenshtein(label.split(), text.split())
                          for label, text in zip(labels, texts))
        rows[label_key] = {
            "letter_error_rate": letter_errors / sum(len(l) for l in labels),
            "word_error_rate": word_errors / sum(len(l.split()) for l in labels),
            "mean_confidence": float(np.mean([c for _, c in results])),
            "decode_wall_s": round(wall, 2),
            "warm_decode_wall_s": round(warm_wall, 2),
            "warm_utterances_per_s": round(len(examples) / warm_wall, 1),
        }
        log("[{}] LER {:.4f} WER {:.4f} ({:.1f}s cold, {:.1f}s warm = {:.1f} utt/s)".format(
            label_key, rows[label_key]["letter_error_rate"],
            rows[label_key]["word_error_rate"], wall, warm_wall,
            rows[label_key]["warm_utterances_per_s"]))

    disagreements = sum(a != b for a, b in zip(predictions["float32"],
                                               predictions["int8"]))
    mxu_disagreements = sum(a != b for a, b in zip(predictions["float32"],
                                                   predictions["int8_mxu"]))
    result = {
        "run": args.run, "epoch": args.epoch, "utterances": len(examples),
        "platform": args.platform,
        "weight_quantization_max_abs_error": quantization_error(params),
        "transcript_disagreements": disagreements,
        "int8_mxu_transcript_disagreements": mxu_disagreements,
        **rows,
    }
    args.out.write_text(json.dumps(result, indent=2))
    log("written to {}".format(args.out))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
