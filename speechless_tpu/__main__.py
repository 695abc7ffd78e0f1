"""Command-line interface: ``python -m speechless_tpu <command>``.

Replaces the reference's `main.py` script (whose "CLI" was a single integer argv index into
a hardcoded list, `/root/reference/main.py:147-148`) with explicit subcommands over the same
workflows.
"""
import argparse
import sys
from pathlib import Path


def _configuration(name: str, data_dir=None, batch_size=None, batches_per_epoch=None):
    from .configuration import Configuration, DataDirectories

    directories = DataDirectories(Path(data_dir)) if data_dir else None
    factories = {
        "english": lambda: Configuration.english(directories=directories),
        "minimal_english": lambda: Configuration.minimal_english(directories=directories),
        "german": lambda: Configuration.german(directories=directories),
        "mixed_german_english": Configuration.mixed_german_english,
    }
    if name not in factories:
        raise SystemExit("Unknown configuration '{}'. Available: {}".format(
            name, ", ".join(sorted(factories))))
    configuration = factories[name]()
    if batch_size is not None:
        configuration.batch_size = batch_size
    if batches_per_epoch is not None:
        configuration.training_batches_per_epoch = batches_per_epoch
    return configuration


def _serving_backend(args, command: str):
    """Build the serving backend shared by ``serve`` and ``transcribe``: exactly one
    of an AOT bundle (``--bundle``) or a live checkpoint (``--run``/``--epoch``)."""
    if (args.bundle is None) == (args.run is None):
        raise SystemExit(
            "{} needs exactly one of --bundle or --run/--epoch".format(command))
    if args.bundle is not None:
        if getattr(args, "lexicon", False):
            raise SystemExit("--lexicon needs a live checkpoint (--run/--epoch): AOT "
                             "bundles bake their decoder at export time, so the flag "
                             "would be silently ignored")
        from .serving_export import ExportedTranscriber
        return ExportedTranscriber(Path(args.bundle))
    if args.epoch is None:
        raise SystemExit("--run requires --epoch")
    configuration = _configuration(args.config, args.data_dir,
                                   args.batch_size, args.batches_per_epoch)
    if getattr(args, "lexicon", False) and not args.kenlm:
        raise SystemExit("--lexicon requires --kenlm (the vocabulary trie rides in "
                         "the word LM)")
    from .serving import Transcriber
    return Transcriber.from_checkpoint(
        configuration.directories.nets_base_directory / args.run, args.epoch,
        configuration.allowed_characters,
        mel_frequency_count=configuration.mel_frequency_count,
        kenlm_directory=(configuration.directories.kenlm_base_directory /
                         configuration.name.lower()) if args.kenlm else None,
        quantize_weights=args.quantize,
        int8_compute=getattr(args, "int8_compute", False),
        lexicon_constrained=getattr(args, "lexicon", False))


def _convert_checkpoint(source: Path, destination: Path) -> None:
    """``convert`` command: migrate checkpoints between this package's ``.npz`` and the
    reference's Keras ``.h5`` (`/root/reference/speechless/net.py:558-572`). Note that
    ``.h5`` files in a run directory also load directly (no conversion needed) via the
    `train/checkpoint.py` fallback — this command is for explicit one-off conversion,
    mainly in the export direction (take a model trained here back to Keras)."""
    from .models import wav2letter as w2l
    from .train import checkpoint as ckpt
    from .train.keras_import import (is_keras_weight_file, load_keras_params,
                                     save_keras_params)

    if is_keras_weight_file(source) and destination.suffix == ".npz":
        ckpt.save_params_npz(destination, load_keras_params(source))
        print("Wrote {}".format(destination))
        return
    if source.suffix == ".npz" and is_keras_weight_file(destination):
        params = ckpt.load_params_npz(source)
        if any("w_q" in layer for layer in params):
            raise SystemExit("{} holds int8-quantized weights, which have no Keras "
                             "representation; convert the float checkpoint.".format(source))
        conv_layers = [layer for layer in params if "w" in layer]
        if len(conv_layers) != len(params):
            print("Dropping {} non-conv parameter group(s) (e.g. trained ASG "
                  "transitions) — Keras files carry conv weights only.".format(
                      len(params) - len(conv_layers)))
        if not conv_layers:
            raise SystemExit("{} holds no conv layers".format(source))
        first_kernel = conv_layers[0]["w"]
        config = w2l.Wav2LetterConfig(
            input_size_per_time_step=int(first_kernel.shape[1]),
            grapheme_set_size=int(conv_layers[-1]["w"].shape[2]),
            use_raw_wave_input=(first_kernel.shape[1] == 1 and first_kernel.shape[0] == 250))
        if len(config.layers) != len(conv_layers):
            raise SystemExit(
                "{} has {} conv layers — not the reference wav2letter geometry of {} "
                "layers, so Keras layer names cannot be assigned.".format(
                    source, len(conv_layers), len(config.layers)))
        save_keras_params(destination, config, conv_layers)
        print("Wrote {}".format(destination))
        return
    raise SystemExit("convert needs one .npz and one .h5/.hdf5 path "
                     "(got {} -> {})".format(source, destination))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="speechless_tpu",
                                     description="TPU-native wav2letter speech recognition")
    sub = parser.add_subparsers(dest="command", required=True)

    def add_config_arg(p):
        p.add_argument("--config", default="minimal_english",
                       help="named configuration (english, minimal_english, german, "
                            "mixed_german_english)")
        p.add_argument("--data-dir", default=None,
                       help="data root (default: ~/speechless-data)")
        p.add_argument("--batch-size", type=int, default=None)
        p.add_argument("--batches-per-epoch", type=int, default=None)

    p_train = sub.add_parser("train", help="train from scratch")
    add_config_arg(p_train)
    p_train.add_argument("--epochs", type=int, default=None, help="epoch limit")
    p_train.add_argument("--device-resident", action="store_true",
                         help="pack the corpus into device HBM and sample batches on "
                              "device (zero steady-state host->device transfer)")
    p_train.add_argument("--spec-augment", action="store_true",
                         help="on-device SpecAugment masking during training "
                              "(ops/specaugment.py, default policy)")
    p_train.add_argument("--clip-norm", type=float, default=None,
                         help="global-norm gradient clipping (default: unclipped, "
                              "reference parity)")
    p_train.add_argument("--lr-warmup-steps", type=int, default=0,
                         help="linear learning-rate warmup from 0 over N steps "
                              "(default: none, reference parity)")
    p_train.add_argument("--lr-decay", choices=("cosine",), default=None,
                         help="anneal the learning rate after warmup (requires "
                              "--lr-decay-steps)")
    p_train.add_argument("--lr-decay-steps", type=int, default=None,
                         help="total schedule length in steps (incl. warmup) for "
                              "--lr-decay cosine")
    p_train.add_argument("--accumulate-steps", type=int, default=None,
                         help="gradient accumulation: one Adam update per N "
                              "micro-batches (effective batch = N x batch size at "
                              "fixed HBM)")
    p_train.add_argument("--remat", action="store_true",
                         help="gradient rematerialization (jax.checkpoint): drop "
                              "most stored activations and recompute them in the "
                              "backward pass (~1.33x step FLOPs for much larger "
                              "batches/buckets when HBM binds)")

    p_transfer = sub.add_parser("transfer", help="transfer-train from the best English model")
    add_config_arg(p_transfer)
    p_transfer.add_argument("--freeze", type=int, default=0, help="frozen layer count")
    p_transfer.add_argument("--reinitialize", action="store_true")
    p_transfer.add_argument("--epochs", type=int, default=None)
    p_transfer.add_argument("--spec-augment", action="store_true",
                            help="on-device SpecAugment masking during training")
    p_transfer.add_argument("--clip-norm", type=float, default=None,
                            help="global-norm gradient clipping (default: unclipped)")

    p_test = sub.add_parser("test", help="evaluate a checkpoint grouped by sub-corpus")
    add_config_arg(p_test)
    p_test.add_argument("--run", required=True, help="run name under nets/")
    p_test.add_argument("--epoch", type=int, required=True)
    p_test.add_argument("--kenlm", action="store_true", help="beam search with LM fusion")
    p_test.add_argument("--beam-width", type=int, default=None)
    p_test.add_argument("--lm-weight", type=float, default=None,
                        help="LM fusion weight (default: the reference's 0.8)")
    p_test.add_argument("--word-count-weight", type=float, default=None)
    p_test.add_argument("--valid-word-count-weight", type=float, default=None)

    p_validate = sub.add_parser("validate", help="epoch-sweep evaluation to CSV")
    add_config_arg(p_validate)
    p_validate.add_argument("--run", required=True)
    p_validate.add_argument("--csv", required=True)
    p_validate.add_argument("--kenlm", action="store_true",
                            help="sweep with the LM-fused beam instead of greedy")

    p_average = sub.add_parser(
        "average", help="average several epoch checkpoints into one "
                        "(decode-time smoothing; wav2letter++/ESPnet-style)")
    add_config_arg(p_average)
    p_average.add_argument("--run", required=True, help="run name under nets/")
    p_average.add_argument("--epochs", type=int, nargs="+", default=None,
                           help="explicit epochs to average")
    p_average.add_argument("--last", type=int, default=5,
                           help="without --epochs: average the last N available "
                                "epochs (default 5)")
    p_average.add_argument("--write-epoch", type=int, default=None,
                           help="epoch number for the averaged checkpoint (default: "
                                "max(epochs) + 1000, clear of any real epoch)")

    p_summarize = sub.add_parser("summarize", help="summarize + save the corpus CSV")
    add_config_arg(p_summarize)

    p_cache = sub.add_parser("fill-cache", help="precompute the spectrogram cache")
    add_config_arg(p_cache)
    p_cache.add_argument("--repair", action="store_true", help="verify + repair entries")

    p_export = sub.add_parser("export",
                              help="write an AOT serving bundle (StableHLO + weights)")
    add_config_arg(p_export)
    p_export.add_argument("--run", required=True, help="run name under nets/")
    p_export.add_argument("--epoch", type=int, required=True)
    p_export.add_argument("--out", required=True, help="bundle output directory")
    p_export.add_argument("--kenlm", action="store_true",
                          help="export the word-LM-fused beam programs")
    p_export.add_argument("--platforms", nargs="+", default=None,
                          help="lowering targets, e.g. tpu cpu (default: current "
                               "backend)")
    p_export.add_argument("--batch-sizes", nargs="+", type=int, default=[1],
                          help="also export batched programs for offline serving, "
                               "e.g. 1 16")
    p_export.add_argument("--quantize", action="store_true",
                          help="int8 per-channel weight quantization: 4x smaller "
                               "bundle, 4x less HBM weight traffic per request")
    p_export.add_argument("--streaming", action="store_true",
                          help="also export per-window frame-token programs "
                               "(host-window streaming sessions from the bundle)")
    p_export.add_argument("--device-streaming", action="store_true",
                          help="also export the fused HBM session-pool feed "
                               "program (device-resident streaming from the "
                               "bundle; dimensions below are baked in)")
    p_export.add_argument("--stream-window-s", type=float, default=8.0,
                          help="device-streaming: decode window seconds")
    p_export.add_argument("--stream-max-sessions", type=int, default=64,
                          help="device-streaming: concurrent session capacity")
    p_export.add_argument("--stream-max-batch", type=int, default=16,
                          help="device-streaming: feeds fused per dispatch")
    p_export.add_argument("--stream-posteriors", action="store_true",
                          help="device-streaming: bake the per-frame posterior "
                               "output into the feed program (enables beam-partial "
                               "sessions on the bundle-backed pool)")

    p_serve = sub.add_parser("serve",
                             help="HTTP transcription service (dynamic micro-batching)")
    add_config_arg(p_serve)
    p_serve.add_argument("--run", default=None, help="run name under nets/ (live model)")
    p_serve.add_argument("--epoch", type=int, default=None)
    p_serve.add_argument("--bundle", default=None,
                         help="serve from an AOT bundle directory (see `export`) "
                              "instead of a checkpoint — no model code on the host")
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--kenlm", action="store_true",
                         help="serve LM-fused beam transcriptions")
    p_serve.add_argument("--lexicon", action="store_true",
                         help="lexicon-constrained beam: every decoded word is in the "
                              "LM vocabulary (requires --kenlm)")
    p_serve.add_argument("--quantize", action="store_true",
                         help="serve from int8 per-channel weights")
    p_serve.add_argument("--int8-compute", action="store_true",
                         help="additionally run the wide convs as int8 MXU "
                              "convolutions (implies --quantize; batched offline "
                              "throughput lever)")
    p_serve.add_argument("--max-batch", type=int, default=16,
                         help="dynamic batcher: max requests per device dispatch")
    p_serve.add_argument("--max-wait-ms", type=float, default=10.0,
                         help="dynamic batcher: batching window after the first request")
    p_serve.add_argument("--max-queue", type=int, default=None,
                         help="bounded backlog: past this many queued requests the "
                              "server sheds load with 503 + Retry-After (default "
                              "8 x max-batch; 0 = unbounded)")
    p_serve.add_argument("--no-warm-up", action="store_true",
                         help="skip compiling all bucket programs before binding")
    p_serve.add_argument("--warm-beam", action="store_true",
                         help="additionally compile the streaming beam-advance "
                              "programs (single + every batch bucket) before "
                              "binding — deployments expecting beam/beam_pipelined "
                              "sessions avoid a minutes-long cold compile stalling "
                              "the first coalesced beam feeds")
    p_serve.add_argument("--beam-engine", choices=("auto", "xla", "pallas"),
                         default="auto",
                         help="streaming beam-advance device step: 'auto' picks "
                              "the Pallas kernel on real TPUs when the decode "
                              "configuration is kernel-expressible, XLA otherwise")
    p_serve.add_argument("--device-streams", action="store_true",
                         help="keep streaming-session windows in device HBM (each "
                              "feed uploads only the new chunk; needs a live --run "
                              "backend or a bundle exported with "
                              "--device-streaming)")
    p_serve.add_argument("--beam-mode", choices=("posterior", "resident"),
                         default="posterior",
                         help="with --device-streams: 'resident' pools the "
                              "incremental beam's carry in HBM and advances it "
                              "inside the feed program — zero extra round-trips "
                              "per feed, lag-free partials (live --run backends "
                              "only)")

    p_transcribe = sub.add_parser(
        "transcribe", help="transcribe audio files offline (wav/flac)")
    add_config_arg(p_transcribe)
    p_transcribe.add_argument("files", nargs="+", help="audio files (wav or flac)")
    p_transcribe.add_argument("--run", default=None, help="run name under nets/")
    p_transcribe.add_argument("--epoch", type=int, default=None)
    p_transcribe.add_argument("--bundle", default=None,
                              help="transcribe with an AOT bundle (see `export`) "
                                   "instead of a checkpoint")
    p_transcribe.add_argument("--kenlm", action="store_true",
                              help="LM-fused beam decode (checkpoint mode)")
    p_transcribe.add_argument("--lexicon", action="store_true",
                              help="lexicon-constrained beam: every decoded word is "
                                   "in the LM vocabulary (requires --kenlm)")
    p_transcribe.add_argument("--quantize", action="store_true",
                              help="int8 per-channel weights (checkpoint mode)")
    p_transcribe.add_argument("--timestamps", action="store_true",
                              help="include word-level emission timestamps "
                                   "(requires --json)")
    p_transcribe.add_argument("--long-form", action="store_true",
                              help="segment at silences for long recordings "
                                   "(> the largest sample bucket)")
    p_transcribe.add_argument("--json", action="store_true", dest="as_json",
                              help="one JSON object per file on stdout")
    p_transcribe.add_argument("--dispatch-batch", type=int, default=16,
                              help="files per batched device dispatch")
    p_transcribe.add_argument("--nbest", type=int, default=1,
                              help="emit the top-N hypotheses with path scores "
                                   "(requires --json; checkpoint mode)")

    p_align = sub.add_parser(
        "align", help="forced alignment: word timestamps for a known transcript")
    add_config_arg(p_align)
    p_align.add_argument("file", help="audio file (wav or flac)")
    p_align.add_argument("--text", default=None,
                         help="the transcript to align (default: read from "
                              "--text-file)")
    p_align.add_argument("--text-file", default=None,
                         help="file holding the transcript")
    p_align.add_argument("--run", default=None, help="run name under nets/")
    p_align.add_argument("--epoch", type=int, default=None)
    p_align.add_argument("--bundle", default=None,
                         help="align with an AOT bundle exported with streaming "
                              "programs (frame posteriors)")
    p_align.add_argument("--quantize", action="store_true",
                         help="int8 weight-only quantization (checkpoint mode)")
    p_align.set_defaults(kenlm=False)  # alignment never needs the LM

    p_convert = sub.add_parser(
        "convert",
        help="convert a checkpoint between .npz and the reference's Keras .h5")
    p_convert.add_argument("source", help="weights file (.npz or .h5/.hdf5)")
    p_convert.add_argument("destination", help="output file with the other extension")

    p_record = sub.add_parser("record", help="record from the microphone and transcribe")
    add_config_arg(p_record)
    p_record.add_argument("--run", default=None, help="run name to load (default: best)")
    p_record.add_argument("--epoch", type=int, default=None)

    args = parser.parse_args(argv)

    # Cross-check the LR-schedule pair at parse time: --lr-decay without steps would
    # otherwise only fail deep inside model construction, and --lr-decay-steps without
    # --lr-decay would be silently dropped by the kwargs guard below.
    if getattr(args, "lr_decay", None) is not None \
            and getattr(args, "lr_decay_steps", None) is None:
        parser.error("--lr-decay requires --lr-decay-steps")
    if getattr(args, "lr_decay_steps", None) is not None \
            and getattr(args, "lr_decay", None) is None:
        parser.error("--lr-decay-steps has no effect without --lr-decay")

    def training_wav2letter_kwargs():
        kwargs = {}
        if args.spec_augment:
            kwargs["spec_augment"] = True
        if args.clip_norm is not None:
            kwargs["gradient_clip_norm"] = args.clip_norm
        if getattr(args, "lr_warmup_steps", 0):
            kwargs["lr_warmup_steps"] = args.lr_warmup_steps
        if getattr(args, "lr_decay", None) is not None:
            kwargs["lr_decay"] = args.lr_decay
            kwargs["lr_decay_steps"] = args.lr_decay_steps
        if getattr(args, "accumulate_steps", None) is not None:
            kwargs["accumulate_gradient_steps"] = args.accumulate_steps
        if getattr(args, "remat", False):
            kwargs["remat"] = True
        return kwargs

    if args.command == "train":
        _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch).train_from_beginning(
            epoch_limit=args.epochs, device_resident=args.device_resident,
            wav2letter_kwargs=training_wav2letter_kwargs())
    elif args.command == "transfer":
        _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch).train_transfer_from_best_english_model(
            frozen_layer_count=args.freeze,
            reinitialize_trainable_loaded_layers=args.reinitialize,
            epoch_limit=args.epochs,
            wav2letter_kwargs=training_wav2letter_kwargs())
    elif args.command == "test":
        configuration = _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch)
        decoder_kwargs = {name: value for name, value in (
            ("beam_width", args.beam_width), ("lm_weight", args.lm_weight),
            ("word_count_weight", args.word_count_weight),
            ("valid_word_count_weight", args.valid_word_count_weight))
            if value is not None}
        if decoder_kwargs and not args.kenlm:
            # Without --kenlm the decode path is greedy and every weight flag would be
            # a silent no-op; fail loudly instead of letting a sweep "show no effect".
            raise SystemExit("--beam-width/--lm-weight/--word-count-weight/"
                             "--valid-word-count-weight require --kenlm (greedy decode "
                             "uses no beam).")
        wav2letter = configuration.load_model(
            load_name=args.run, load_epoch=args.epoch,
            allowed_characters_for_loaded_model=None, use_kenlm=args.kenlm,
            **decoder_kwargs)
        configuration.test_model_grouped_by_loaded_corpus_name(wav2letter)
    elif args.command == "validate":
        from .experiments import validate_to_csv
        validate_to_csv(_configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch), args.run, Path(args.csv),
                        use_ken_lm=args.kenlm)
    elif args.command == "average":
        from .experiments import available_epochs
        from .train import checkpoint as ckpt
        configuration = _configuration(args.config, args.data_dir, args.batch_size,
                                       args.batches_per_epoch)
        directory = configuration.directories.nets_base_directory / args.run
        if args.epochs:
            epochs = sorted(args.epochs)
        else:
            if args.last < 1:
                raise SystemExit("--last must be >= 1")
            epochs = available_epochs(directory)[-args.last:]
            if not epochs:
                raise SystemExit("no checkpoints under {}".format(directory))
        write_epoch = (args.write_epoch if args.write_epoch is not None
                       else max(epochs) + 1000)
        if write_epoch in epochs:
            raise SystemExit("--write-epoch {} would overwrite one of the averaged "
                             "checkpoints".format(write_epoch))
        params = ckpt.average_checkpoint_params(directory, epochs)
        path = ckpt.save_checkpoint(directory, write_epoch, params)
        print("Averaged epochs {} -> {}".format(epochs, path))
    elif args.command == "summarize":
        _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch).summarize_and_save_corpus()
    elif args.command == "fill-cache":
        _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch).fill_cache(repair_incorrect=args.repair)
    elif args.command == "export":
        configuration = _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch)
        from .serving import Transcriber
        from .serving_export import export_transcriber
        transcriber = Transcriber.from_checkpoint(
            configuration.directories.nets_base_directory / args.run, args.epoch,
            configuration.allowed_characters,
            mel_frequency_count=configuration.mel_frequency_count,
            kenlm_directory=(configuration.directories.kenlm_base_directory /
                             configuration.name.lower()) if args.kenlm else None,
            quantize_weights=args.quantize)
        export_transcriber(transcriber, Path(args.out), platforms=args.platforms,
                           batch_sizes=tuple(args.batch_sizes),
                           streaming=args.streaming,
                           device_streaming={
                               "window_s": args.stream_window_s,
                               "max_sessions": args.stream_max_sessions,
                               "max_batch": args.stream_max_batch,
                               "posteriors": args.stream_posteriors,
                           } if args.device_streaming else None)
    elif args.command == "serve":
        from .serving_http import TranscriptionServer
        backend = _serving_backend(args, "serve")
        if args.bundle is None and not args.no_warm_up:
            backend.warm_up()
        if args.beam_mode == "resident" and not args.device_streams:
            raise SystemExit("--beam-mode resident needs --device-streams (the "
                             "beam carry lives in the pooled HBM state)")
        server = TranscriptionServer(backend, host=args.host, port=args.port,
                                     max_batch=args.max_batch,
                                     max_wait_ms=args.max_wait_ms,
                                     device_streams=args.device_streams,
                                     max_queue=args.max_queue,
                                     beam_engine=args.beam_engine,
                                     beam_mode=args.beam_mode)
        if args.device_streams and not args.no_warm_up:
            server.streams.warm_up()  # the fused feed program compiles before binding
        if args.warm_beam:
            try:
                server.streams.warm_up_beam()
            except ValueError as error:  # backend without posterior programs
                raise SystemExit("--warm-beam: {}".format(error))
        server.serve_forever()
    elif args.command == "transcribe":
        import json as json_module

        from .features.audio_io import load_audio
        from .serving import words_from_frame_tokens

        if args.timestamps and args.long_form:
            raise SystemExit("--timestamps is per-utterance; long-form "
                             "segmentation does not carry emission offsets")
        if args.timestamps and not args.as_json:
            raise SystemExit("--timestamps requires --json (the plain output is one "
                             "'file<TAB>text' line per file)")
        if args.nbest < 1:
            raise SystemExit("--nbest must be >= 1")
        if args.nbest > 1 and not args.as_json:
            raise SystemExit("--nbest requires --json")
        if args.nbest > 1 and (args.timestamps or args.long_form):
            raise SystemExit("--nbest is mutually exclusive with --timestamps and "
                             "--long-form")
        backend = _serving_backend(args, "transcribe")
        if args.nbest > 1:
            if not hasattr(backend, "transcribe_nbest"):
                raise SystemExit("--nbest needs a checkpoint backend (--run/--epoch); "
                                 "AOT bundles export 1-best programs only")
            beam_width = getattr(backend, "beam_width", None)
            if beam_width is not None and args.nbest > beam_width:
                raise SystemExit("--nbest must be <= the decoder's beam width ({})"
                                 .format(beam_width))
            for name in args.files:
                audio = load_audio(Path(name))
                hypotheses = backend.transcribe_nbest(audio, args.nbest)
                print(json_module.dumps({
                    "file": name,
                    "text": hypotheses[0][0] if hypotheses else "",
                    "hypotheses": [{"text": text, "score": round(score, 4)}
                                   for text, score in hypotheses]}))
            return
        audios = [load_audio(Path(f)) for f in args.files]
        if args.long_form:
            decoded = [(backend.transcribe_long_audio(audio), None)
                       for audio in audios]
        elif len(audios) > 1 and backend.has_batched_programs:
            decoded = backend.transcribe_batch(audios,
                                               **({"batch_size": args.dispatch_batch}
                                                  if args.bundle is None else {}))
        else:
            decoded = [backend.transcribe_audio_with_confidence(audio)
                       for audio in audios]
        if args.timestamps:
            # One batched frame-token pass for every file: a per-file dispatch costs
            # ~24 ms of round-trip alone on tunneled backends. Bundles expose only the
            # single-window `frame_tokens` (and only when exported with streaming
            # programs), so they go file-by-file.
            if len(audios) > 1 and hasattr(backend, "frame_tokens_batch"):
                frames_list = backend.frame_tokens_batch(
                    audios, batch_size=args.dispatch_batch)
            else:
                frames_list = [backend.frame_tokens(audio) for audio in audios]
        else:
            frames_list = [None] * len(audios)
        for name, frames, (text, confidence) in zip(args.files, frames_list, decoded):
            if args.as_json:
                record = {"file": name, "text": text}
                if confidence is not None:
                    record["confidence"] = confidence
                if args.timestamps:
                    words = words_from_frame_tokens(
                        frames, backend.codec, backend.blank_index,
                        backend.seconds_per_frame)
                    record["words"] = [
                        {"word": word, "start_s": round(start, 4),
                         "end_s": round(end, 4)} for word, start, end in words]
                print(json_module.dumps(record))
            else:
                print("{}\t{}".format(name, text))
    elif args.command == "align":
        import json as json_module

        from .features.audio_io import load_audio
        from .serving import align_audio

        if (args.text is None) == (args.text_file is None):
            raise SystemExit("align needs exactly one of --text or --text-file")
        transcript = (args.text if args.text is not None
                      else Path(args.text_file).read_text(encoding="utf8").strip())
        backend = _serving_backend(args, "align")
        # Bundles exported without streaming posteriors cannot align (the live
        # Transcriber always can — its posterior program jit-compiles on demand).
        from .serving_streaming import _serves_posteriors
        if not _serves_posteriors(backend):
            raise SystemExit("this bundle has no frame-posterior programs; "
                             "re-export with --streaming")
        words = align_audio(backend, load_audio(Path(args.file)), transcript)
        print(json_module.dumps({"file": args.file, "text": transcript,
                                 "words": words}))
    elif args.command == "convert":
        _convert_checkpoint(Path(args.source), Path(args.destination))
    elif args.command == "record":
        from .io import record_plot_and_save
        configuration = _configuration(args.config, args.data_dir, args.batch_size, args.batches_per_epoch)
        example = record_plot_and_save()
        if args.run is not None:
            epoch = args.epoch
            if epoch is None:
                from .experiments import available_epochs
                epochs = available_epochs(
                    configuration.directories.nets_base_directory / args.run)
                if not epochs:
                    raise SystemExit("No checkpoints found for run '{}'.".format(args.run))
                epoch = epochs[-1]
            wav2letter = configuration.load_model(load_name=args.run, load_epoch=epoch,
                                                  allowed_characters_for_loaded_model=None)
        else:
            # The reference crashed here on fresh setups (its pinned "best English"
            # checkpoint never exists locally); fail with guidance instead.
            try:
                wav2letter = configuration.load_best_english_model()
            except FileNotFoundError:
                raise SystemExit(
                    "No pinned best-English checkpoint under {} — pass --run <name> "
                    "(and optionally --epoch) to select one of your trained runs.".format(
                        configuration.directories.nets_base_directory))
        print(wav2letter.predict(example))


if __name__ == "__main__":
    main()
