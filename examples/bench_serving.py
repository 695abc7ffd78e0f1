"""Serving-latency bench: single-utterance p50/p95 for greedy vs on-device word-LM beam.

Uses the trained checkpoint + in-repo word trigram produced by
examples/scaled_quality_eval.py (run that first) and transcribes a real held-out
utterance as a sanity check. The LM-fused path runs features + acoustic model + beam +
word-LM fusion (HBM trie + hashed n-gram tables) in ONE jitted device program — no host
round-trips.

    python examples/bench_serving.py [--data-dir /tmp/speechless-quality]
                                     [--run quality-english-devres] [--epoch 40]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax

from speechless_tpu.serving import Transcriber
from speechless_tpu.text.charsets import english_frequent_characters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run", default="quality-english-devres")
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--duration-s", type=float, default=4.0)
    parser.add_argument("--offline-utterances", type=int, default=64,
                        help="also measure offline throughput: transcribe_batch over "
                             "this many utterances (0 disables)")
    parser.add_argument("--offline-batch-size", type=int, default=16)
    args = parser.parse_args()

    print("platform:", jax.devices()[0].platform, flush=True)
    net_directory = args.data_dir / "nets" / args.run
    kenlm_directory = args.data_dir / "kenlm" / "english"

    for label, lm_dir, quantize in (
            ("greedy", None, False),
            ("greedy int8 weights", None, True),
            ("word-LM beam (device, W=25, prune 8)", kenlm_directory, False),
            ("word-LM beam + int8 weights", kenlm_directory, True)):
        transcriber = Transcriber.from_checkpoint(
            net_directory, args.epoch, english_frequent_characters,
            kenlm_directory=lm_dir, quantize_weights=quantize)
        transcriber.warm_up(durations_s=[args.duration_s])
        p50, p95 = transcriber.measure_latency(duration_s=args.duration_s)
        print("{:42s} p50 {:6.1f} ms   p95 {:6.1f} ms".format(
            label, p50 * 1000, p95 * 1000), flush=True)

        # Sanity transcription on a real held-out wav (first test-speaker utterance).
        wavs = sorted((args.data_dir / "corpus" / "English" / "synthetic").rglob("*.wav"))
        if wavs:
            print("  sample: {!r}".format(transcriber.transcribe_file(wavs[0])),
                  flush=True)

        if args.offline_utterances:
            # Offline throughput: batched dispatches vs one dispatch per utterance.
            import time

            import numpy as np
            rng = np.random.RandomState(0)
            n = int(args.duration_s * 16000)
            audios = [(0.1 * rng.randn(n)).astype(np.float32)
                      for _ in range(args.offline_utterances)]
            transcriber.transcribe_batch(audios[:args.offline_batch_size],
                                         batch_size=args.offline_batch_size)  # compile
            start = time.time()
            results = transcriber.transcribe_batch(
                audios, batch_size=args.offline_batch_size)
            wall = time.time() - start
            start = time.time()
            for audio in audios:
                transcriber.transcribe_audio(audio)
            single_wall = time.time() - start
            print("  offline: {} utts batched(bs={}) {:6.2f}s = {:6.1f} utt/s "
                  "vs single-dispatch {:6.2f}s = {:6.1f} utt/s ({:.1f}x)".format(
                      len(results), args.offline_batch_size, wall, len(results) / wall,
                      single_wall, len(results) / single_wall, single_wall / wall),
                  flush=True)


if __name__ == "__main__":
    main()
