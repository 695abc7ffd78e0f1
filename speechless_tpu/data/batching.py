"""Batch generation: reference-compatible random batching plus TPU static-shape bucketing
and asynchronous host->device prefetch.

The reference generator (`/root/reference/speechless/corpus.py:205-245`) samples 64 random
cached spectrograms per step and pads to the batch max — a dynamic shape per step, which
would force an XLA recompile every step. Here:

* `LabeledSpectrogramBatchGenerator` keeps the reference surface (preview/training/test
  batches, multiprocessing cache fill);
* `pad_to_bucket` rounds the padded time dimension up to a small set of bucket boundaries
  (geometric progression) and label length to a multiple, so XLA compiles once per
  (time-bucket, label-bucket) pair;
* `Prefetcher` overlaps feature loading (host) with device compute via a background thread
  and `jax.device_put`.
"""
from __future__ import annotations

import multiprocessing
import random
import threading
from pathlib import Path
from queue import Queue
from typing import TYPE_CHECKING, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..features.example import CachedLabeledSpectrogram, LabeledSpectrogram
from ..text.graphemes import GraphemeCodec
from ..utils.tools import log, mkdir, paginate

if TYPE_CHECKING:  # runtime import is deferred so spawned cache-fill workers stay JAX-free
    from ..train.trainer import Batch

# Time buckets in frames: geometric ~1.3x progression keeps padding waste <~15% per batch
# while bounding distinct compilations. Frame counts above the last bucket fall back to
# exact-multiple-of-512 rounding.
DEFAULT_TIME_BUCKETS = (128, 192, 256, 384, 512, 768, 1024, 1280, 1536, 2048, 3072, 4096)
LABEL_BUCKET_MULTIPLE = 64


def _cache_spectrogram(labeled_spectrogram: CachedLabeledSpectrogram) -> None:
    labeled_spectrogram.z_normalized_transposed_spectrogram()


def _repair_spectrogram(labeled_spectrogram: CachedLabeledSpectrogram) -> None:
    labeled_spectrogram.repair_cached_file_if_incorrect()


class LabeledSpectrogramBatchGenerator:
    """Reference-compatible batch source over disk-cached spectrograms.

    ``bucket_training_batches=True`` draws each training batch from one duration bucket
    (near-equal-population contiguous ranges of sorted durations) instead of uniformly
    from the whole corpus. Every example keeps the same marginal sampling probability
    (bucket picked ∝ population, example uniform within), but a batch of like-length
    utterances pads to its own bucket's time boundary — on corpora with wide duration
    spreads this roughly halves padded frames, i.e. host->device bytes and conv FLOPs.
    """

    def __init__(self, corpus, spectrogram_cache_directory: Path, batch_size: int = 64,
                 bucket_training_batches: bool = False):
        mkdir(spectrogram_cache_directory)
        self.batch_size = batch_size
        self.bucket_training_batches = bucket_training_batches
        self.spectrogram_cache_directory = Path(spectrogram_cache_directory)
        self.labeled_training_spectrograms = [
            CachedLabeledSpectrogram(e, spectrogram_cache_directory=spectrogram_cache_directory)
            for e in corpus.training_examples]
        self.labeled_test_spectrograms = [
            CachedLabeledSpectrogram(e, spectrogram_cache_directory=spectrogram_cache_directory)
            for e in corpus.test_examples]
        self.labeled_spectrograms = (self.labeled_training_spectrograms +
                                     self.labeled_test_spectrograms)

    def preview_batch(self) -> List[LabeledSpectrogram]:
        return self.labeled_spectrograms[:self.batch_size]

    def _duration_buckets(self) -> List[List[LabeledSpectrogram]]:
        """Contiguous near-equal-population duration buckets, each >= 2x batch size."""
        def duration(s: CachedLabeledSpectrogram) -> float:
            probed = getattr(s.original, "duration_in_s", 0.0)
            return probed if probed > 0.0 else float("inf")  # failed probes: last bucket

        ordered = sorted(self.labeled_training_spectrograms, key=duration)
        bucket_count = max(1, min(8, len(ordered) // (2 * self.batch_size)))
        edges = np.linspace(0, len(ordered), bucket_count + 1).astype(int)
        return [ordered[edges[i]:edges[i + 1]] for i in range(bucket_count)]

    def training_batches(self) -> Iterator[List[LabeledSpectrogram]]:
        if not self.bucket_training_batches:
            while True:
                yield random.sample(self.labeled_training_spectrograms, self.batch_size)
        buckets = self._duration_buckets()
        weights = [len(bucket) for bucket in buckets]
        while True:
            bucket = random.choices(buckets, weights=weights)[0]
            yield random.sample(bucket, self.batch_size)

    def test_batches(self) -> Iterable[List[LabeledSpectrogram]]:
        return paginate(self.labeled_test_spectrograms, self.batch_size)

    def fill_cache(self, repair_incorrect: bool = False) -> None:
        """Parallel feature precompute across all host cores (`corpus.py:231-245`).

        Uses a spawn-based pool: the parent process has JAX loaded (fork of a
        multi-threaded process risks deadlock and triggers CPython's fork warning), and
        spawned workers import only the numpy feature path, never the JAX backend."""
        context = multiprocessing.get_context("spawn")
        with context.Pool(processes=multiprocessing.cpu_count()) as pool:
            total = len(self.labeled_spectrograms)
            not_yet_cached = [s for s in self.labeled_spectrograms if not s.is_cached()]
            to_calculate = self.labeled_spectrograms if repair_incorrect else not_yet_cached
            log("Filling cache with {} spectrograms: {} already cached, {} to calculate.".format(
                total, total - len(not_yet_cached), len(to_calculate)))
            worker = _repair_spectrogram if repair_incorrect else _cache_spectrogram
            results = [pool.apply_async(worker, (s,)) for s in to_calculate]
            pool.close()
            pool.join()
            failures = sum(1 for r in results if not r.successful())
            if failures:
                log("Cache fill: {} examples failed.".format(failures))


class HintedBatch(list):
    """A batch slice carrying global-batch bucket hints (consumed by
    `batch_from_spectrograms` so every host pads to identical static shapes)."""

    def __init__(self, items, bucket_hints):
        super().__init__(items)
        self.bucket_hints = bucket_hints  # (min_frames, min_label_length)


class ShardedBatchGenerator(LabeledSpectrogramBatchGenerator):
    """Per-host input sharding for multi-host training (SURVEY.md §2c).

    Every host draws the *same* deterministic global batch per step (seeded by step index)
    and keeps its own disjoint slice, so the per-host batches concatenate to exactly the
    global batch regardless of host count — the standard JAX multi-host feeding pattern.
    ``training_batches`` yields `HintedBatch`es whose bucket hints come from the *global*
    batch, so all hosts pick the same time/label buckets (independently bucketing the
    slices would let hosts compile different shapes for the same step).
    """

    def __init__(self, corpus, spectrogram_cache_directory: Path, batch_size: int = 64,
                 host_id: Optional[int] = None, host_count: Optional[int] = None,
                 seed: int = 42, bucket_training_batches: bool = False):
        super().__init__(corpus, spectrogram_cache_directory, batch_size,
                         bucket_training_batches=bucket_training_batches)
        if host_id is None or host_count is None:
            import jax

            host_id = jax.process_index()
            host_count = jax.process_count()
        if batch_size % host_count != 0:
            raise ValueError("batch_size {} must divide evenly across {} hosts".format(
                batch_size, host_count))
        self.host_id = host_id
        self.host_count = host_count
        self.seed = seed

    def training_batches(self, hop_length: int = 128,
                         sample_rate: int = 16000) -> Iterator["HintedBatch"]:
        """Yield this host's slice as a `HintedBatch` whose (min_frames, min_label_length)
        hints come from the global batch. Frame hints use duration probes (an upper bound —
        padding-only error); label hints use raw label lengths (an upper bound for both CTC
        and ASG encodings)."""
        per_host = self.batch_size // self.host_count

        def frame_hint(s: CachedLabeledSpectrogram) -> int:
            duration = s.original.duration_in_s
            if duration <= 0.0:
                # A failed header probe degrades to 0.0 s (reference semantics) — but a
                # 0-frame hint here would let hosts pick different buckets for the same
                # step and desync static shapes. Fall back to the exact feature length,
                # which every host computes identically.
                return s.z_normalized_transposed_spectrogram().shape[0]
            return 1 + (int(duration * sample_rate) + hop_length) // hop_length

        # Duration-bucketed sampling stays host-consistent: the bucket choice and the
        # within-bucket sample both come from the per-step seeded RNG, and the buckets
        # themselves are a deterministic function of the (identical) corpus.
        buckets = self._duration_buckets() if self.bucket_training_batches else None
        weights = [len(bucket) for bucket in buckets] if buckets else None
        step = 0
        while True:
            rand = random.Random("{}:{}".format(self.seed, step))
            if buckets is not None:
                global_batch = rand.sample(rand.choices(buckets, weights=weights)[0],
                                           self.batch_size)
            else:
                global_batch = rand.sample(self.labeled_training_spectrograms,
                                           self.batch_size)
            min_frames = max(frame_hint(s) for s in global_batch)
            min_label_length = max(len(s.label) for s in global_batch)
            yield HintedBatch(
                global_batch[self.host_id * per_host:(self.host_id + 1) * per_host],
                (min_frames, min_label_length))
            step += 1


def bucket_length(length: int, buckets: Sequence[int] = DEFAULT_TIME_BUCKETS,
                  fallback_multiple: int = 512) -> int:
    """Smallest bucket >= length; beyond the table, round up to a multiple."""
    for bucket in buckets:
        if length <= bucket:
            return bucket
    return ((length + fallback_multiple - 1) // fallback_multiple) * fallback_multiple


def pad_to_bucket(spectrograms: List[np.ndarray], labels: List[str], codec: GraphemeCodec,
                  time_buckets: Sequence[int] = DEFAULT_TIME_BUCKETS,
                  label_multiple: int = LABEL_BUCKET_MULTIPLE,
                  min_frames: int = 0, min_label_length: int = 0) -> Batch:
    """Assemble a statically-shaped `Batch` from per-utterance (time, mel) features.

    Zero-pads features to the time bucket, encodes labels -1-padded to a label bucket
    (the reference's padding scheme, `net.py:578-587` + `grapheme_enconding.py:28`,
    but with bucketed rather than exact-max shapes). ``min_frames``/``min_label_length``
    floor the bucket choice — multi-host feeding passes global-batch hints here so all
    hosts pick identical static shapes.
    """
    from ..train.trainer import Batch  # deferred: keeps spawn workers off the JAX path

    batch_size = len(spectrograms)
    input_lengths = np.array([s.shape[0] for s in spectrograms], dtype=np.int32)
    t_max = bucket_length(max(int(input_lengths.max()), min_frames), time_buckets)
    feature_dim = spectrograms[0].shape[1]
    inputs = np.zeros((batch_size, t_max, feature_dim), dtype=np.float32)
    for i, s in enumerate(spectrograms):
        inputs[i, : s.shape[0]] = s

    encoded = codec.encode_label_batch(labels)
    label_lengths = (encoded >= 0).sum(axis=1).astype(np.int32) if encoded.size \
        else np.zeros(batch_size, np.int32)
    label_extent = max(encoded.shape[1], min_label_length)
    u_max = max(((label_extent + label_multiple - 1) // label_multiple) * label_multiple,
                label_multiple)
    padded_labels = -np.ones((batch_size, u_max), dtype=np.int32)
    padded_labels[:, : encoded.shape[1]] = encoded

    return Batch(inputs=inputs, input_lengths=input_lengths,
                 labels=padded_labels, label_lengths=label_lengths)


# Raw-wave inputs bucket on sample counts: the frame buckets scaled by the 128-sample
# feature hop, so a corpus buckets identically whether fed as mel frames or raw samples.
RAW_WAVE_SAMPLE_BUCKETS = tuple(b * 128 for b in DEFAULT_TIME_BUCKETS)


def batch_from_spectrograms(batch: List[LabeledSpectrogram], codec: GraphemeCodec,
                            raw_wave: bool = False, **kwargs) -> Tuple[Batch, List[str]]:
    """Load features for a list of `LabeledSpectrogram`s and bucket-pad them.

    ``raw_wave=True`` feeds (samples, 1) z-normalized waveforms instead of mel features
    (the `use_raw_wave_input` model family; sample-count buckets). Honors
    `HintedBatch.bucket_hints` (multi-host shape consistency). Returns the device-ready
    Batch plus the expected transcripts."""
    hints = getattr(batch, "bucket_hints", None)
    if hints is not None:
        scale = 128 if raw_wave else 1  # frame hints -> sample hints under raw wave
        kwargs.setdefault("min_frames", hints[0] * scale)
        kwargs.setdefault("min_label_length", hints[1])
    if raw_wave:
        kwargs.setdefault("time_buckets", RAW_WAVE_SAMPLE_BUCKETS)
        spectrograms = [s.z_normalized_raw_wave() for s in batch]
    else:
        spectrograms = [s.z_normalized_transposed_spectrogram() for s in batch]
    labels = [s.label for s in batch]
    return pad_to_bucket(spectrograms, labels, codec, **kwargs), labels


def stack_batches(batches: Sequence["Batch"]) -> "Batch":
    """Stack a group of bucketed host batches on a new leading steps axis (the
    `lax.scan` multi-step input: one device dispatch runs the whole group).

    Batches may come from different buckets; features are zero-padded and labels
    -1-padded to the group max so the stack is rectangular. Bucketing keeps the group
    max stable across groups, so the multi-step program compiles once."""
    from ..train.trainer import Batch  # deferred: keeps spawn workers off the JAX path

    t_max = max(b.inputs.shape[1] for b in batches)
    u_max = max(b.labels.shape[1] for b in batches)

    def pad_inputs(b: Batch) -> np.ndarray:
        if b.inputs.shape[1] == t_max:
            return b.inputs
        padded = np.zeros((b.inputs.shape[0], t_max, b.inputs.shape[2]), b.inputs.dtype)
        padded[:, : b.inputs.shape[1]] = b.inputs
        return padded

    def pad_labels(b: Batch) -> np.ndarray:
        if b.labels.shape[1] == u_max:
            return b.labels
        padded = -np.ones((b.labels.shape[0], u_max), b.labels.dtype)
        padded[:, : b.labels.shape[1]] = b.labels
        return padded

    return Batch(inputs=np.stack([pad_inputs(b) for b in batches]),
                 input_lengths=np.stack([b.input_lengths for b in batches]),
                 labels=np.stack([pad_labels(b) for b in batches]),
                 label_lengths=np.stack([b.label_lengths for b in batches]))


def chunked(iterator: Iterator, size: int) -> Iterator[list]:
    """Group an iterator into lists of ``size`` (trailing short group dropped: the
    multi-step program's steps count is static)."""
    import itertools

    while True:
        group = list(itertools.islice(iterator, size))
        if len(group) < size:
            return
        yield group


class Prefetcher:
    """Background-thread prefetch of prepared batches onto the device.

    Close (or use as a context manager) when done: with an infinite source iterator the
    worker would otherwise keep preparing and holding ``depth`` device batches alive for
    the life of the process."""

    def __init__(self, batch_iterator: Iterator, prepare, depth: int = 2):
        self._iterator = batch_iterator
        self._prepare = prepare
        self._queue: Queue = Queue(maxsize=depth)
        self._done = object()
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._iterator:
                if self._stopped.is_set():
                    return
                prepared = self._prepare(item)
                while not self._stopped.is_set():
                    try:
                        self._queue.put(prepared, timeout=0.1)
                        break
                    except Exception:  # queue.Full
                        continue
                if self._stopped.is_set():
                    return
        except Exception as e:  # surface worker errors to the consumer
            self._queue.put(e)
        self._queue.put(self._done)

    def close(self):
        """Stop the worker and drop any buffered batches."""
        self._stopped.set()
        try:
            while True:
                self._queue.get_nowait()
        except Exception:  # queue.Empty
            pass
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item
