"""Realistic-scale end-to-end quality evaluation (fills the BASELINE.md LER/WER axes).

Drives the production facade — wav files -> LibriSpeech-layout corpus -> spectrogram
cache -> bucketed batches -> `Configuration.train_or_resume` -> per-epoch checkpoints —
on a synthetic corpus with a learnable audio<->text mapping (data/synthetic.py), then
evaluates the full decode matrix on held-out test utterances:

1. greedy decode (on-device),
2. LM-fused beam decode (`use_kenlm=True`, word trigram built in-repo by lm/arpa_builder),
3. cross-charset transfer: the trained English model remapped onto the German charset
   with the first layers frozen, fine-tuned on a German-charset corpus, vs a
   from-scratch baseline with the identical budget.

Network access is not required (the reference's LibriSpeech download path is blocked in
this image); the corpus scale (default 1000 utterances, 2-10 s, full charset) matches the
VERDICT round-1 requirement. Run:

    python examples/scaled_quality_eval.py                    # full run (TPU, ~30-60 min)
    python examples/scaled_quality_eval.py --smoke            # tiny CPU smoke test
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root import
from speechless_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--utterances", type=int, default=1000)
    parser.add_argument("--transfer-utterances", type=int, default=300)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--transfer-epochs", type=int, default=12)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--steps-per-epoch", type=int, default=100)
    parser.add_argument("--frozen-layers", type=int, default=8)
    parser.add_argument("--multi-step", type=int, default=10,
                        help="optimizer updates per device dispatch (lax.scan)")
    parser.add_argument("--difficulty", choices=("standard", "hard"), default="standard",
                        help="synthetic-corpus tier; 'hard' lands greedy in a 5-15%% LER "
                             "band so beam/LM/transfer deltas stay measurable")
    parser.add_argument("--clip-norm", type=float, default=None,
                        help="global-norm gradient clipping (guards late-training loss "
                             "blowups on the noisy hard tier; None = reference-parity "
                             "unclipped Adam)")
    parser.add_argument("--spec-augment", action="store_true",
                        help="train with on-device SpecAugment (ops/specaugment.py, "
                             "default policy); runs under a '-sa' run name so it never "
                             "resumes an unaugmented checkpoint")
    parser.add_argument("--device-resident", action="store_true",
                        help="pack the corpus into HBM and sample batches on device "
                             "(zero steady-state host->device transfer)")
    parser.add_argument("--lr-warmup-steps", type=int, default=0,
                        help="linear LR warmup over N steps")
    parser.add_argument("--lr-decay", choices=("cosine",), default=None,
                        help="cosine LR decay (requires --lr-decay-steps)")
    parser.add_argument("--lr-decay-steps", type=int, default=None,
                        help="total schedule steps incl. warmup")
    parser.add_argument("--dropout", type=float, default=None,
                        help="dropout rate before the non-big convs (the reference's "
                             "regularizer; counters raw-wave overfit at small corpus "
                             "sizes — see QUALITY_r03_raw1k.json)")
    parser.add_argument("--raw-wave", action="store_true",
                        help="train the raw-wave model family (wave-conv frontend on "
                             "(samples,1) waveforms; combine with --device-resident "
                             "to pack the waveforms into HBM)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny corpus + few epochs on CPU, to validate the flow")
    parser.add_argument("--skip-transfer", action="store_true")
    args = parser.parse_args()

    if args.smoke:
        args.utterances = 24
        args.transfer_utterances = 12
        args.epochs = 2
        args.transfer_epochs = 1
        args.batch_size = 8
        args.steps_per_epoch = 8
        # multi_step=1 on CPU: XLA's CPU backend takes tens of minutes to LLVM-compile a
        # scan over the full model (the facade multi-step path is covered on a small
        # model by tests/test_multi_step.py; the TPU run uses the default 10).
        args.multi_step = 1
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        enable_compilation_cache()

    import jax
    from speechless_tpu.configuration import Configuration, DataDirectories
    from speechless_tpu.data.librispeech import LibriSpeechCorpus
    from speechless_tpu.data.corpus import TrainingTestSplit
    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.lm.arpa_builder import build_kenlm_directory
    from speechless_tpu.text.charsets import (english_frequent_characters,
                                              german_frequent_characters)
    from speechless_tpu.utils.tools import log

    log("platform: {}".format(jax.devices()[0].platform))
    directories = DataDirectories(args.data_dir)
    results = {}

    def evaluate(wav2letter, generator, what):
        start = time.time()
        result = wav2letter.test_and_predict_batches(generator.test_batches())
        elapsed = time.time() - start
        results[what] = {
            "letter_error_rate": result.average_letter_error_rate,
            "word_error_rate": result.average_word_error_rate,
            "loss": result.average_loss,
            "examples": len(result.results),
            "decode_wall_s": round(elapsed, 2),
            "utterances_per_s": round(len(result.results) / elapsed, 1),
            # The wall includes one-time per-bucket eval-program compiles and tunneled
            # per-batch dispatch (~24 ms RTT each); steady-state decoder throughput is
            # the BASELINE.md decode table, not this number.
            "wall_includes_compiles_and_rtt": True,
        }
        log("[{}] {} ({} utts in {:.1f}s)".format(what, result.summary_line(),
                                                  len(result.results), elapsed))
        return result

    # -- corpus + cache + LM ------------------------------------------------
    corpus_name = ("synthetic" if args.difficulty == "standard"
                   else "synthetic-" + args.difficulty)
    corpus_directory = generate_corpus(
        directories.corpus_base_directory / "English", corpus_name,
        utterance_count=args.utterances, seed=0,
        difficulty=args.difficulty)
    config = Configuration(
        name="English",
        corpus_from_directory=lambda d: LibriSpeechCorpus(
            base_directory=d, corpus_name=corpus_name,
            training_test_split=TrainingTestSplit.randomly(0.9)),
        directories=directories, batch_size=args.batch_size,
        training_batches_per_epoch=args.steps_per_epoch)
    log("corpus: {} train / {} test".format(len(config.corpus.training_examples),
                                            len(config.corpus.test_examples)))
    t0 = time.time()
    config.fill_cache()
    cache_fill_s = time.time() - t0
    log("cache fill: {:.1f}s for {} examples".format(
        cache_fill_s, len(config.batch_generator.labeled_spectrograms)))
    results["cache_fill"] = {
        "wall_s": round(cache_fill_s, 1),
        "examples": len(config.batch_generator.labeled_spectrograms)}

    build_kenlm_directory(
        (e.label for e in config.corpus.training_examples),
        directories.kenlm_base_directory / config.name.lower(),
        allowed_characters=config.allowed_characters, order=3)

    # -- train (resumable) --------------------------------------------------
    # One variant marker shared by the run name, the transfer run names, and the output
    # stem — a variant flag missing from any of the three would silently resume or
    # overwrite a non-variant artifact.
    variant = "-sa" if args.spec_augment else ""
    if args.raw_wave:
        if args.spec_augment:
            raise SystemExit("--spec-augment is a mel-feature augmentation; it does "
                             "not apply to --raw-wave")
        variant += "-raw"
    if args.dropout is not None:
        variant += "-do{:g}".format(args.dropout)
    if args.lr_decay is not None and args.lr_decay_steps is None:
        raise SystemExit("--lr-decay requires --lr-decay-steps")
    if args.lr_decay_steps is not None and args.lr_decay is None:
        raise SystemExit("--lr-decay-steps has no effect without --lr-decay")
    if args.lr_warmup_steps or args.lr_decay:
        # The decay-steps count is part of the variant key: two cosine runs with
        # different horizons must never resume each other's checkpoints.
        variant += "-lr{}{}w{}".format(args.lr_decay or "warm",
                                       args.lr_decay_steps or "",
                                       args.lr_warmup_steps)
    run_name = "quality-english-devres" if args.device_resident else "quality-english"
    if args.difficulty != "standard":
        # Non-standard tiers get recalibrated between runs; keying the run name on the
        # corpus generation signature makes train_or_resume start fresh whenever the
        # corpus changed (a tier tweak must never silently resume a model trained on
        # the previous corpus — that happened in cal6 and invalidated the run).
        import zlib
        signature = (corpus_directory / ".complete").read_text()
        run_name += "-{}-{}".format(args.difficulty,
                                    format(zlib.crc32(signature.encode()), "08x"))
    run_name += variant
    t0 = time.time()
    w2l_kwargs = ({"gradient_clip_norm": args.clip_norm}
                  if args.clip_norm is not None else {})
    if args.spec_augment:
        w2l_kwargs["spec_augment"] = True
    if args.raw_wave:
        w2l_kwargs["use_raw_wave_input"] = True
    if args.dropout is not None:
        w2l_kwargs["dropout"] = args.dropout
    if args.lr_warmup_steps:
        w2l_kwargs["lr_warmup_steps"] = args.lr_warmup_steps
    if args.lr_decay is not None:
        w2l_kwargs["lr_decay"] = args.lr_decay
        w2l_kwargs["lr_decay_steps"] = args.lr_decay_steps
    if args.device_resident:
        config.train_or_resume(run_name, epoch_limit=args.epochs, callback_step=5,
                               device_resident=True, wav2letter_kwargs=w2l_kwargs)
    else:
        config.train_or_resume(run_name, epoch_limit=args.epochs, callback_step=5,
                               multi_step=args.multi_step, wav2letter_kwargs=w2l_kwargs)
    train_wall_s = time.time() - t0
    results["train"] = {"wall_s": round(train_wall_s, 1), "epochs": args.epochs,
                        "steps": args.epochs * args.steps_per_epoch,
                        "batch_size": args.batch_size,
                        "device_resident": args.device_resident}
    log("training wall-clock: {:.1f}s".format(train_wall_s))

    # -- decode matrix on held-out test utterances ---------------------------
    load_kwargs = {"use_raw_wave_input": True} if args.raw_wave else {}
    greedy = config.load_model(run_name, args.epochs,
                               allowed_characters_for_loaded_model=None, **load_kwargs)
    evaluate(greedy, config.batch_generator, "greedy")
    beam = config.load_model(run_name, args.epochs,
                             allowed_characters_for_loaded_model=None, use_kenlm=True,
                             **load_kwargs)
    evaluate(beam, config.batch_generator, "beam_lm")

    # -- transfer: English -> German charset ---------------------------------
    suffix = ("" if args.difficulty == "standard" else "-" + args.difficulty) + variant
    if not args.skip_transfer:
        german_corpus_name = ("synthetic-de" if args.difficulty == "standard"
                              else "synthetic-de-" + args.difficulty)
        generate_corpus(directories.corpus_base_directory / "German", german_corpus_name,
                        utterance_count=args.transfer_utterances, seed=100,
                        characters=german_frequent_characters,
                        difficulty=args.difficulty)
        german = Configuration(
            name="German", allowed_characters=german_frequent_characters,
            corpus_from_directory=lambda d: LibriSpeechCorpus(
                base_directory=d, corpus_name=german_corpus_name,
                allowed_characters=german_frequent_characters,
                training_test_split=TrainingTestSplit.randomly(0.8)),
            directories=directories, batch_size=args.batch_size,
            training_batches_per_epoch=args.steps_per_epoch)
        german.fill_cache()

        transfer = german.load_model(
            run_name, args.epochs, frozen_layer_count=args.frozen_layers,
            allowed_characters_for_loaded_model=english_frequent_characters,
            **w2l_kwargs)
        t0 = time.time()
        # Transfer keeps the donor's epoch numbering (reference `net.py:556` semantics:
        # fit_generator(initial_epoch=load_epoch)), so the limit is donor + budget.
        german.train(transfer, run_name="quality-german-transfer" + suffix,
                     epoch_limit=args.epochs + args.transfer_epochs,
                     callback_step=max(1, args.transfer_epochs),
                     multi_step=args.multi_step)
        results["transfer_train"] = {"wall_s": round(time.time() - t0, 1),
                                     "epochs": args.transfer_epochs,
                                     "frozen_layers": args.frozen_layers}
        evaluate(transfer, german.batch_generator, "transfer")

        from speechless_tpu.system import Wav2Letter
        scratch = Wav2Letter(german.mel_frequency_count,
                             allowed_characters=german.allowed_characters, **w2l_kwargs)
        german.train(scratch, run_name="quality-german-scratch" + suffix,
                     epoch_limit=args.transfer_epochs,
                     callback_step=max(1, args.transfer_epochs),
                     multi_step=args.multi_step)
        evaluate(scratch, german.batch_generator, "scratch_same_budget")

    results["difficulty"] = args.difficulty
    results["raw_wave"] = args.raw_wave
    results["gradient_clip_norm"] = args.clip_norm
    results["spec_augment"] = args.spec_augment
    results["dropout"] = args.dropout
    results["lr_schedule"] = {"warmup_steps": args.lr_warmup_steps,
                              "decay": args.lr_decay,
                              "decay_steps": args.lr_decay_steps}
    out_stem = ("quality_results" if args.difficulty == "standard"
                else "quality_results_" + args.difficulty) + variant.replace("-", "_")
    out = args.data_dir / (out_stem + ".json")
    out.write_text(json.dumps(results, indent=2))
    log("results written to {}".format(out))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
