"""E2E input-pipeline benchmark on the REAL cached corpus (VERDICT round-1 'weak' #3).

Breaks the production training path into its stages and measures each on the synthetic
quality corpus (run examples/scaled_quality_eval.py first to create corpus + cache):

1. host: spectrogram cache read (.npy) for a 64-utterance random batch,
2. host: bucket-pad + label encode (`pad_to_bucket`),
3. host->device transfer (f16 when convs are bf16),
4. device: one train step (and the amortized multi-step scan),
5. E2E epoch throughput through `system.train`'s actual loop (prefetch overlapped),
   single-step vs multi-step.

    python examples/bench_input_pipeline.py [--data-dir /tmp/speechless-quality]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax

from speechless_tpu.configuration import Configuration, DataDirectories
from speechless_tpu.data.librispeech import LibriSpeechCorpus
from speechless_tpu.data.corpus import TrainingTestSplit
from speechless_tpu.data.batching import batch_from_spectrograms
from speechless_tpu.system import Wav2Letter
from speechless_tpu.utils.tools import log


def median_time(fn, repeats=10):
    fn()
    times = []
    for _ in range(repeats):
        start = time.time()
        fn()
        times.append(time.time() - start)
    return float(np.median(times))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=Path("/tmp/speechless-quality"))
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps-per-epoch", type=int, default=50)
    args = parser.parse_args()

    print("platform:", jax.devices()[0].platform, flush=True)
    config = Configuration(
        name="English",
        corpus_from_directory=lambda d: LibriSpeechCorpus(
            base_directory=d, corpus_name="synthetic",
            training_test_split=TrainingTestSplit.randomly(0.9)),
        directories=DataDirectories(args.data_dir), batch_size=args.batch_size,
        training_batches_per_epoch=args.steps_per_epoch)
    generator = config.batch_generator
    config.fill_cache()
    w = Wav2Letter(config.mel_frequency_count, allowed_characters=config.allowed_characters)
    batches = generator.training_batches()

    # -- stage timings on one representative random batch --------------------
    batch_list = next(batches)
    cache_s = median_time(lambda: [s.z_normalized_transposed_spectrogram()
                                   for s in batch_list])
    host_batch, _ = batch_from_spectrograms(batch_list, w.grapheme_encoding)
    pad_s = median_time(
        lambda: batch_from_spectrograms(batch_list, w.grapheme_encoding)) - cache_s
    shape = tuple(host_batch.inputs.shape)

    import jax.numpy as jnp
    noop = jax.jit(lambda x: x + 1)
    rtt_s = median_time(lambda: float(noop(jnp.float32(0.0))))

    def transfer():
        device = w._device_batch(host_batch)
        # Sync via value transfer (block_until_ready is a no-op over the tunnel);
        # a one-element fetch forces the full inputs array onto the device.
        float(device.inputs[0, 0, 0])
        return device

    transfer_s = max(median_time(transfer) - rtt_s, 1e-9)
    device_batch = transfer()

    from speechless_tpu.train.trainer import make_train_step
    step_fn = make_train_step(w.config, w.optimizer, donate=False,
                              criterion=w._criterion)
    state = w.state

    def one_step():
        _, metrics = step_fn(state, device_batch)
        return float(metrics["loss"])

    step_s = max(median_time(one_step, repeats=5) - rtt_s, 1e-9)
    bytes_sent = (device_batch.inputs.dtype.itemsize * np.prod(shape)
                  + host_batch.labels.nbytes)
    print("\nStage timings (B={}, padded shape {}):".format(args.batch_size, shape))
    print("  cache read          {:7.1f} ms".format(cache_s * 1000))
    print("  bucket-pad + encode {:7.1f} ms".format(max(pad_s, 0) * 1000))
    print("  host->device        {:7.1f} ms  ({:.0f} MB/s of {:.1f} MB)".format(
        transfer_s * 1000, bytes_sent / transfer_s / 1e6, bytes_sent / 1e6))
    print("  train step          {:7.1f} ms".format(step_s * 1000), flush=True)

    # -- E2E epochs through the real facade loop -----------------------------
    utterances = args.epochs * args.steps_per_epoch * args.batch_size
    for multi_step in (1, 10):
        start = time.time()
        w.train(generator.training_batches(),
                preview_labeled_spectrogram_batch=batch_list[:4],
                tensor_board_log_directory=args.data_dir / "pipeline-bench-logs",
                net_directory=args.data_dir / "pipeline-bench-nets",
                batches_per_epoch=args.steps_per_epoch, epoch_limit=args.epochs,
                multi_step=multi_step, callback_step=10 ** 6, save_step=10 ** 6)
        elapsed = time.time() - start
        print("E2E train (cached corpus, multi_step={}): {:.0f} utt/s "
              "({} steps in {:.1f}s, incl. compile)".format(
                  multi_step, utterances / elapsed,
                  args.epochs * args.steps_per_epoch, elapsed), flush=True)
        w._train_step = None  # rebuild for the next mode

    # -- device-resident corpus: zero steady-state host->device transfer ------
    devres_scalars = args.data_dir / "pipeline-bench-logs-devres" / "scalars.csv"
    if devres_scalars.exists():
        devres_scalars.unlink()  # fresh per-epoch rates for the steady-state median
    start = time.time()
    w.train([], preview_labeled_spectrogram_batch=batch_list[:4],
            tensor_board_log_directory=args.data_dir / "pipeline-bench-logs-devres",
            net_directory=args.data_dir / "pipeline-bench-nets",
            batches_per_epoch=args.steps_per_epoch, epoch_limit=args.epochs,
            callback_step=10 ** 6, save_step=10 ** 6,
            device_resident_examples=generator.labeled_training_spectrograms,
            batch_size=args.batch_size)
    elapsed = time.time() - start
    print("E2E train (device-resident corpus): {:.0f} utt/s "
          "({} steps in {:.1f}s, incl. pack+transfer+compile)".format(
              utterances / elapsed, args.epochs * args.steps_per_epoch, elapsed),
          flush=True)
    # Steady-state epochs (compile + corpus upload already paid):
    import csv
    with devres_scalars.open() as f:
        rows = list(csv.DictReader(f))
    rates = [float(r["utterances_per_second"]) for r in rows[1:]] or \
            [float(r["utterances_per_second"]) for r in rows]
    print("E2E train (device-resident, steady-state epochs): {:.0f} utt/s".format(
        float(np.median(rates))), flush=True)


if __name__ == "__main__":
    main()
