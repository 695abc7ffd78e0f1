"""Multi-stream streaming load bench (`serving_streaming.StreamingSessionPool`).

Simulates N concurrent live transcription streams feeding chunked audio as fast as the
service accepts it, and measures aggregate throughput (audio seconds transcribed per
wall second = the service's total real-time-factor budget) with window micro-batching
on (shared `frame_tokens_batch` dispatches) vs off (one dispatch per window — the
pre-batcher behavior). On the tunneled chip each dispatch costs ~24 ms RTT alone, so N
streams' windows coalescing into one program is the difference between RTT x windows
and RTT x batches.

    python examples/bench_streaming_load.py --run <run> --epoch 40 \
        [--streams 16] [--stream-seconds 30]

Writes evidence JSON to --out (default evidence/STREAMING_LOAD_r03.json).
"""
import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_streaming import StreamingSessionPool
from speechless_tpu.text.charsets import english_frequent_characters


def run_load(transcriber, streams: int, audio_clips, chunk_samples: int,
             max_batch: int, window_s: float, margin_s: float) -> dict:
    pool = StreamingSessionPool(transcriber, window_s=window_s, margin_s=margin_s,
                                max_batch=max_batch, max_wait_ms=20.0)
    pool.start()
    texts = [None] * streams
    try:
        def run(i):
            sid = pool.create()
            audio = audio_clips[i]
            for start in range(0, len(audio), chunk_samples):
                pool.feed(sid, audio[start:start + chunk_samples])
            texts[i] = pool.finish(sid)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(streams)]
        start = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - start
        metrics = pool.batcher.metrics()
    finally:
        pool.stop()
    audio_seconds = sum(len(a) for a in audio_clips) / 16000.0
    return {"streams": streams, "audio_seconds": round(audio_seconds, 1),
            "wall_s": round(wall, 2),
            "aggregate_xrt": round(audio_seconds / wall, 2),
            "windows": metrics["windows"], "batches": metrics["batches"],
            "mean_batch_size": round(metrics["mean_batch_size"], 2),
            "transcript_sample": (texts[0] or "")[:60]}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run", required=True)
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--streams", type=int, default=16)
    parser.add_argument("--stream-seconds", type=float, default=30.0)
    parser.add_argument("--chunk-ms", type=float, default=500.0)
    parser.add_argument("--window-s", type=float, default=8.0)
    parser.add_argument("--margin-s", type=float, default=2.0)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "STREAMING_LOAD_r03.json")
    args = parser.parse_args()

    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    transcriber = Transcriber.from_checkpoint(
        args.data_dir / "nets" / args.run, args.epoch, english_frequent_characters)

    rng = np.random.RandomState(0)
    samples = int(args.stream_seconds * 16000)
    clips = [(0.1 * rng.randn(samples)).astype(np.float32)
             for _ in range(args.streams)]
    chunk = int(args.chunk_ms * 16)

    # Warm the window-bucket programs (single and batched) outside the timed runs.
    window = np.zeros(int(args.window_s * 16000), np.float32)
    transcriber.frame_tokens(window)
    transcriber.frame_tokens_batch([window] * args.max_batch,
                                   batch_size=args.max_batch)

    results = {"platform": jax.devices()[0].platform,
               "window_s": args.window_s, "margin_s": args.margin_s,
               "chunk_ms": args.chunk_ms}
    for label, max_batch in (("batched", args.max_batch), ("unbatched", 1)):
        row = run_load(transcriber, args.streams, clips, chunk, max_batch,
                       args.window_s, args.margin_s)
        results[label] = row
        print("{:10s} max_batch={:3d}: {:6.1f}x realtime aggregate over {} streams, "
              "{} windows in {} batches (mean {:.1f})".format(
                  label, max_batch, row["aggregate_xrt"], row["streams"],
                  row["windows"], row["batches"], row["mean_batch_size"]), flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
