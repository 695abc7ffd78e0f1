"""Loaded-QPS bench for the HTTP serving surface (`serving_http.py`).

Fires concurrent wav-body requests at a local `TranscriptionServer` and measures
throughput + latency with dynamic micro-batching on vs off, demonstrating that under
concurrency the batcher amortizes the per-dispatch round-trip (~24 ms RTT alone on the
tunneled chip) across coalesced requests.

    python examples/bench_http_serving.py --run <run> --epoch 40 \
        [--data-dir /tmp/speechless-quality] [--clients 16] [--requests 96]

Writes evidence JSON to --out (default evidence/HTTP_r03.json when run from the repo).
"""
import argparse
import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from speechless_tpu.serving import Transcriber
from speechless_tpu.serving_http import TranscriptionServer
from speechless_tpu.text.charsets import english_frequent_characters


def wav_body(duration_s: float, seed: int) -> bytes:
    import scipy.io.wavfile as wavfile

    audio = (0.1 * np.random.RandomState(seed).randn(int(duration_s * 16000)))
    buffer = io.BytesIO()
    wavfile.write(buffer, 16000, (audio * 32767).astype(np.int16))
    return buffer.getvalue()


def run_load(port: int, bodies, clients: int) -> dict:
    url = "http://127.0.0.1:{}/v1/transcribe".format(port)
    latencies = []
    lock = threading.Lock()
    queue = list(enumerate(bodies))

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                _, body = queue.pop()
            request = urllib.request.Request(url, body,
                                             {"Content-Type": "audio/wav"})
            start = time.time()
            with urllib.request.urlopen(request, timeout=600) as response:
                json.loads(response.read())
            with lock:
                latencies.append(time.time() - start)

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - start
    latencies.sort()
    return {"requests": len(bodies), "clients": clients, "wall_s": round(wall, 3),
            "qps": round(len(bodies) / wall, 1),
            "p50_ms": round(1000 * latencies[len(latencies) // 2], 1),
            "p95_ms": round(1000 * latencies[int(len(latencies) * 0.95)], 1)}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run", required=True)
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--duration-s", type=float, default=4.0)
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=96)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "HTTP_r03.json")
    args = parser.parse_args()

    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    transcriber = Transcriber.from_checkpoint(
        args.data_dir / "nets" / args.run, args.epoch, english_frequent_characters)
    transcriber.warm_up(durations_s=[args.duration_s])
    # Compile the batched program before measuring (a cold compile inside the timed
    # window would dominate the wall on remote-compiled backends).
    n = int(args.duration_s * 16000)
    transcriber.transcribe_batch(
        [np.zeros(n, np.float32)] * args.max_batch, batch_size=args.max_batch)

    bodies = [wav_body(args.duration_s, seed) for seed in range(args.requests)]
    results = {"duration_s": args.duration_s, "platform": jax.devices()[0].platform}

    for label, max_batch, clients in (
            ("batched", args.max_batch, args.clients),
            ("unbatched", 1, args.clients),
            ("sequential", args.max_batch, 1)):
        server = TranscriptionServer(transcriber, port=0, max_batch=max_batch,
                                     max_wait_ms=10.0)
        server.start()
        try:
            row = run_load(server.port, bodies, clients)
            row["server_metrics"] = server.batcher.metrics()
        finally:
            server.stop()
        results[label] = row
        print("{:12s} max_batch={:3d} clients={:3d}: {:6.1f} qps, p50 {:6.1f} ms, "
              "p95 {:6.1f} ms, mean batch {:.1f}".format(
                  label, max_batch, clients, row["qps"], row["p50_ms"], row["p95_ms"],
                  row["server_metrics"]["mean_batch_size"]), flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
