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
    args = parser.parse_args()

    print("platform:", jax.devices()[0].platform, flush=True)
    net_directory = args.data_dir / "nets" / args.run
    kenlm_directory = args.data_dir / "kenlm" / "english"

    for label, lm_dir in (("greedy", None), ("word-LM beam (device, W=25, prune 8)",
                                             kenlm_directory)):
        transcriber = Transcriber.from_checkpoint(
            net_directory, args.epoch, english_frequent_characters,
            kenlm_directory=lm_dir)
        transcriber.warm_up(durations_s=[args.duration_s])
        p50, p95 = transcriber.measure_latency(duration_s=args.duration_s)
        print("{:42s} p50 {:6.1f} ms   p95 {:6.1f} ms".format(
            label, p50 * 1000, p95 * 1000), flush=True)

        # Sanity transcription on a real held-out wav (first test-speaker utterance).
        wavs = sorted((args.data_dir / "corpus" / "English" / "synthetic").rglob("*.wav"))
        if wavs:
            print("  sample: {!r}".format(transcriber.transcribe_file(wavs[0])),
                  flush=True)


if __name__ == "__main__":
    main()
