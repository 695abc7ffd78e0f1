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

Writes evidence JSON to --out (default evidence/STREAMING_LOAD_r04.json);
--only <modes...> re-measures a subset and merges into the existing file.
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
from speechless_tpu.serving_streaming import (StreamingSessionPool,
                                              StreamingTranscriber)
from speechless_tpu.text.charsets import english_frequent_characters


def run_device_load(transcriber, streams: int, audio_clips, chunk_samples: int,
                    max_batch: int, window_s: float, margin_s: float,
                    partial_decode: str = "greedy",
                    post_rows: str = "default",
                    beam_engine: str = "auto") -> dict:
    """Device-resident windows (`serving_device_stream.DeviceStreamingPool`): each
    feed uploads only the chunk — the window never re-crosses the link. This is the
    mode that should escape the link-bandwidth wall the other two hit (both the
    batched and unbatched host-window modes re-upload ~window_s of audio per feed and
    measured within 2% of each other on the 37 MB/s tunnel). ``partial_decode="beam"``
    measures beam-partial sessions: the posterior block additionally crosses the link
    per feed, and the host advances each session's incremental prefix beam."""
    from speechless_tpu.serving_device_stream import (DEFAULT_POST_ROWS,
                                                      DeviceStreamingPool)

    texts = [None] * streams
    resident = partial_decode == "beam_resident"
    session_decode = "beam" if resident else partial_decode
    pool = DeviceStreamingPool(transcriber, window_s=window_s, margin_s=margin_s,
                               max_batch=max_batch, max_wait_ms=20.0,
                               max_sessions=max(streams, max_batch),
                               beam_partials=partial_decode != "greedy",
                               post_rows=(None if post_rows == "full"
                                          else DEFAULT_POST_ROWS),
                               beam_engine=beam_engine,
                               beam_mode="resident" if resident else "posterior")
    pool.start()
    try:
        pool.warm_up()  # one compile, outside the timed region
        if partial_decode != "greedy":
            # Compile the advance programs (single + bucketed batch sizes) outside
            # the timed region too (resident: the advance is in the feed program).
            pool.warm_up_beam()

        def run(i):
            sid = pool.create(partial_decode=session_decode)
            audio = audio_clips[i]
            for start in range(0, len(audio), chunk_samples):
                pool.feed(sid, audio[start:start + chunk_samples])
            texts[i] = pool.finish(sid)

        wall = _run_threads(run, streams)
        metrics = pool.batcher.metrics()
        advance = None
        if resident:
            advance = {"mode": "resident (in-program, zero extra dispatches)"}
        elif partial_decode != "greedy":
            batcher = pool._get_beam_batcher()
            m = batcher.metrics()
            decoder = batcher.decoder
            advance = {
                "advances": m["advances"], "batches": m["batches"],
                "mean_batch": round(m["mean_batch_size"], 2),
                "latency_p50_s": round(m.get("latency_p50_s", 0.0), 4),
                "latency_p95_s": round(m.get("latency_p95_s", 0.0), 4),
                # piece_rounds > dispatched feeds means sessions fell behind the
                # cadence and caught up in multi-piece scans (each round pays a
                # scalar fetch + a chunk_frames-length scan).
                "decoder_feeds": decoder.stat_feeds,
                "piece_rounds": decoder.stat_piece_rounds,
            }
    finally:
        pool.stop()
    audio_seconds = sum(len(a) for a in audio_clips) / 16000.0
    out = {"streams": streams, "audio_seconds": round(audio_seconds, 1),
           "wall_s": round(wall, 2),
           "aggregate_xrt": round(audio_seconds / wall, 2),
           "post_rows": pool.post_rows,
           "windows": metrics["feeds"], "batches": metrics["batches"],
           "mean_batch_size": round(metrics["feeds"] / metrics["batches"], 2)
           if metrics["batches"] else 0.0,
           "transcript_sample": (texts[0] or "")[:60]}
    if advance is not None:
        out["advance"] = advance
    return out


def run_load(transcriber, streams: int, audio_clips, chunk_samples: int,
             batched: bool, max_batch: int, window_s: float,
             margin_s: float, partial_decode: str = "greedy",
             beam_engine: str = "auto") -> dict:
    texts = [None] * streams
    if batched:
        pool = StreamingSessionPool(transcriber, window_s=window_s, margin_s=margin_s,
                                    max_batch=max_batch, max_wait_ms=20.0,
                                    beam_engine=beam_engine)
        pool.start()
        try:
            if partial_decode != "greedy":
                pool.warm_up_beam()

            def run(i):
                sid = pool.create(partial_decode=partial_decode)
                audio = audio_clips[i]
                for start in range(0, len(audio), chunk_samples):
                    pool.feed(sid, audio[start:start + chunk_samples])
                texts[i] = pool.finish(sid)

            wall = _run_threads(run, streams)
            batcher = (pool.posterior_batcher if partial_decode != "greedy"
                       else pool.batcher)
            metrics = batcher.metrics()
        finally:
            pool.stop()
        windows, batches = metrics["windows"], metrics["batches"]
    else:
        # The true pre-batcher baseline: every stream dispatches its own windows from
        # its own thread via `frame_tokens` directly, so the per-dispatch RTTs of
        # different streams OVERLAP (funneling them through a single one-item batcher
        # thread would serialize them back-to-back and flatter the batched number).
        counter_lock = threading.Lock()
        counter = {"windows": 0}

        def counted_frame_fn(audio):
            with counter_lock:
                counter["windows"] += 1
            return transcriber.frame_tokens(audio)

        def run(i):
            stream = StreamingTranscriber(transcriber, window_s=window_s,
                                          margin_s=margin_s,
                                          frame_fn=counted_frame_fn)
            audio = audio_clips[i]
            for start in range(0, len(audio), chunk_samples):
                stream.feed(audio[start:start + chunk_samples])
            stream.finish()
            texts[i] = stream.text

        wall = _run_threads(run, streams)
        windows = batches = counter["windows"]
    audio_seconds = sum(len(a) for a in audio_clips) / 16000.0
    return {"streams": streams, "audio_seconds": round(audio_seconds, 1),
            "wall_s": round(wall, 2),
            "aggregate_xrt": round(audio_seconds / wall, 2),
            "windows": windows, "batches": batches,
            "mean_batch_size": round(windows / batches, 2) if batches else 0.0,
            "transcript_sample": (texts[0] or "")[:60]}


def _run_threads(run, streams: int) -> float:
    threads = [threading.Thread(target=run, args=(i,)) for i in range(streams)]
    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.time() - start


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
    parser.add_argument("--beam", action="store_true",
                        help="additionally measure beam-partial sessions "
                             "(partial_decode='beam') on both pools; pass --run "
                             "with an LM-fused checkpoint to load the word LM")
    parser.add_argument("--kenlm", action="store_true",
                        help="LM-fuse the beam (kenlm/english under --data-dir)")
    parser.add_argument("--only", nargs="*", default=None,
                        help="measure only these modes (device, batched, unbatched, "
                             "device-beam, batched-beam); merges into an existing "
                             "--out file so partial reruns keep the other rows")
    parser.add_argument("--reps", type=int, default=1,
                        help="timed repetitions per mode; the reported row is the "
                             "MEDIAN-aggregate_xrt run, with every sample and the "
                             "spread recorded alongside (flagship numbers need n>=5 "
                             "on an idle host — round-4 verdict)")
    parser.add_argument("--beam-engine", choices=("auto", "xla", "pallas"),
                        default="auto",
                        help="incremental beam device step for the beam modes "
                             "(auto = Pallas kernel on real TPUs; xla = the "
                             "round-4 vmapped XLA step, the ablation baseline)")
    parser.add_argument("--full-posteriors", action="store_true",
                        help="ablation: device beam modes fetch the FULL window "
                             "posterior block per feed (post_rows=None) instead of "
                             "the static sliced block (the round-5 default)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "STREAMING_LOAD_r04.json")
    args = parser.parse_args()

    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    transcriber = Transcriber.from_checkpoint(
        args.data_dir / "nets" / args.run, args.epoch, english_frequent_characters,
        kenlm_directory=(args.data_dir / "kenlm" / "english" if args.kenlm
                         else None))

    rng = np.random.RandomState(0)
    samples = int(args.stream_seconds * 16000)
    clips = [(0.1 * rng.randn(samples)).astype(np.float32)
             for _ in range(args.streams)]
    chunk = int(args.chunk_ms * 16)

    # Warm EVERY bucket the streams can touch, single and batched programs, outside
    # the timed runs: windows grow from one chunk up to the full window, so dispatches
    # land in every sample bucket up to bucket(window) — a cold per-bucket compile
    # (minutes on the tunneled backend) inside the timed region would corrupt
    # whichever run hits it first.
    window_samples = int(args.window_s * 16000)
    buckets = [b for b in transcriber.sample_buckets if b <= window_samples]
    top = next((b for b in transcriber.sample_buckets if b >= window_samples), None)
    if top is not None and top not in buckets:
        buckets.append(top)
    for bucket in buckets:
        warm = np.zeros(bucket, np.float32)
        transcriber.frame_tokens(warm)
        transcriber.frame_tokens_batch([warm] * args.max_batch,
                                       batch_size=args.max_batch)
        if args.beam:
            transcriber.frame_log_probs(warm)
            transcriber.frame_log_probs_batch([warm] * args.max_batch,
                                              batch_size=args.max_batch)
    if args.beam:
        # Compile the incremental beam's step program (shared across sessions via
        # the jit cache) outside the timed region — an LM-fused beam compile can
        # take minutes on remote-compiled backends.
        warm_stream = StreamingTranscriber(transcriber, window_s=args.window_s,
                                           margin_s=args.margin_s,
                                           partial_decode="beam")
        warm_stream.transcribe_stream(np.zeros(int(args.window_s * 16000) + chunk,
                                               np.float32), chunk)

    results = {"platform": jax.devices()[0].platform,
               "window_s": args.window_s, "margin_s": args.margin_s,
               "chunk_ms": args.chunk_ms}
    if args.only and args.out.exists():
        results = {**json.loads(args.out.read_text()), **results}
    modes = [("device", None, "greedy"), ("batched", True, "greedy"),
             ("unbatched", False, "greedy")]
    if args.beam:
        # The round-3 flagship under load: live beam partials via the incremental
        # prefix beam, on both the host-window pool and the HBM-resident pool.
        # The -pipe rows overlap each session's advance with its next chunk
        # (partial lags one feed, final transcript byte-identical — see
        # serving_streaming.StreamingTranscriber partial_decode='beam_pipelined').
        modes += [("device-beam", None, "beam"), ("batched-beam", True, "beam"),
                  ("device-beam-pipe", None, "beam_pipelined"),
                  ("batched-beam-pipe", True, "beam_pipelined"),
                  # Round-5 flagship: HBM-resident beam carry, advanced INSIDE
                  # the fused feed program (zero extra dispatches per feed).
                  ("device-beam-resident", None, "beam_resident")]
    if args.only:
        known = {m[0] for m in modes}
        unknown = [name for name in args.only if name not in known]
        if unknown:
            # Catch both typos and beam rows requested without --beam — otherwise
            # the script rewrites the evidence file unchanged and exits silently,
            # looking like a successful rerun.
            parser.error("unknown --only mode(s) {} (available with these flags: {})"
                         .format(unknown, sorted(known)))
        modes = [m for m in modes if m[0] in args.only]
    for label, batched, partial in modes:
        runs = []
        for rep in range(max(1, args.reps)):
            if batched is None:
                row = run_device_load(transcriber, args.streams, clips, chunk,
                                      args.max_batch, args.window_s, args.margin_s,
                                      partial_decode=partial,
                                      post_rows=("full" if args.full_posteriors
                                                 else "default"),
                                      beam_engine=args.beam_engine)
            else:
                row = run_load(transcriber, args.streams, clips, chunk, batched,
                               args.max_batch, args.window_s, args.margin_s,
                               partial_decode=partial,
                               beam_engine=args.beam_engine)
            if partial != "greedy":
                row["beam_engine"] = args.beam_engine
            runs.append(row)
            print("{:16s} rep {}/{}: {:6.1f}x realtime over {} streams, "
                  "{} windows in {} batches (mean {:.1f})".format(
                      label, rep + 1, max(1, args.reps), row["aggregate_xrt"],
                      row["streams"], row["windows"], row["batches"],
                      row["mean_batch_size"]), flush=True)
        samples = sorted(r["aggregate_xrt"] for r in runs)
        median = samples[len(samples) // 2] if len(samples) % 2 else round(
            (samples[len(samples) // 2 - 1] + samples[len(samples) // 2]) / 2, 2)
        row = next(r for r in runs
                   if abs(r["aggregate_xrt"] - median) ==
                   min(abs(r["aggregate_xrt"] - median) for r in runs))
        row = {**row, "samples_xrt": [r["aggregate_xrt"] for r in runs],
               "median_xrt": median,
               "spread_xrt": [samples[0], samples[-1]]}
        results[label] = row
        print("{:16s} MEDIAN {:6.1f}x of {} (spread {}-{})".format(
            label, median, len(samples), samples[0], samples[-1]), flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
