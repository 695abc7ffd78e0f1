"""Device-resident training corpus: the whole feature set lives in HBM, batches are
sampled on device — zero per-step host->device transfer.

The reference streams every batch through the host (`net.py:550-556` feeds a Keras
generator; round 1 mirrored that with a prefetching host pipeline). On
bandwidth-limited links the host feed dominates end-to-end throughput: the measured
tunneled-TPU E2E rate is ~70 utt/s while the compute path sustains ~2000 utt/s
(BASELINE.md). TPU-natively, a speech corpus is small relative to HBM — dev-clean-scale
features are a few hundred MB against 16 GB — so the right design is to pad the corpus
ONCE into rectangular device arrays and move batch sampling into the training program:

* features are bucket-padded to the corpus max (same `bucket_length` grid as the host
  batcher, so shapes stay XLA-friendly), labels -1-padded, lengths carried exactly as in
  the host `Batch` contract;
* each train step draws a uniform batch WITHOUT replacement within the batch (the
  reference's `random.sample`, `corpus.py:224-226`) via `jax.random.choice` and gathers
  rows with one `jnp.take` — on-device, inside the same XLA program as the update;
* a whole epoch (`batches_per_epoch` optimizer steps) runs as ONE device dispatch
  (`lax.scan`), so steady-state training is compute-bound regardless of host link speed.

Scaling note (multi-chip): under a mesh the corpus rows are SHARDED over the data axis
(``PartitionSpec('data')``), so N data shards hold N x one chip's HBM worth of corpus.
Batch sampling stays global and replicated (every device computes the same
`jax.random.choice` indices), and the `jnp.take` gather from the row-sharded operand is
partitioned by GSPMD into an ICI collective — a few batch-rows of traffic per step
against an N x residency win, and the sampled batches (hence loss trajectories) are
bit-identical to the replicated layout (pinned in tests/test_device_dataset.py).
Corpora beyond the MESH's combined HBM stay on the host pipeline (`system.train`'s
default path), which remains fully supported.
"""
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ..features.example import LabeledSpectrogram
from ..text.graphemes import GraphemeCodec
from .batching import DEFAULT_TIME_BUCKETS, LABEL_BUCKET_MULTIPLE, bucket_length

# jnp arrays in practice; numpy accepted for host-side tests.
Array = np.ndarray


class DeviceDataset(NamedTuple):
    """The full corpus as rectangular device arrays (the `trainer.Batch` fields with a
    corpus-sized leading axis)."""
    inputs: Array          # (N, T_max, F) features, f32 (or f16 under bf16 compute)
    input_lengths: Array   # (N,) int32 valid frame counts
    labels: Array          # (N, U_max) int32, -1 padded
    label_lengths: Array   # (N,) int32

    @property
    def example_count(self) -> int:
        return self.inputs.shape[0]

    def nbytes(self) -> int:
        return sum(np.asarray(f).nbytes if isinstance(f, np.ndarray) else f.nbytes
                   for f in self)


def pack_dataset(spectrograms: Sequence[np.ndarray], labels: Sequence[str],
                 codec: GraphemeCodec,
                 time_buckets: Sequence[int] = DEFAULT_TIME_BUCKETS,
                 label_multiple: int = LABEL_BUCKET_MULTIPLE,
                 dtype: np.dtype = np.float32) -> DeviceDataset:
    """Pad per-utterance (time, mel) features + transcripts into host-side rectangular
    arrays (the padding rules of `batching.pad_to_bucket`, applied corpus-wide)."""
    input_lengths = np.array([s.shape[0] for s in spectrograms], np.int32)
    t_max = bucket_length(int(input_lengths.max()), time_buckets)
    feature_dim = spectrograms[0].shape[1]
    inputs = np.zeros((len(spectrograms), t_max, feature_dim), dtype)
    for i, s in enumerate(spectrograms):
        inputs[i, : s.shape[0]] = s

    encoded = codec.encode_label_batch(list(labels))
    label_lengths = (encoded >= 0).sum(axis=1).astype(np.int32) if encoded.size \
        else np.zeros(len(spectrograms), np.int32)
    u_max = max(((encoded.shape[1] + label_multiple - 1) // label_multiple)
                * label_multiple, label_multiple)
    padded_labels = -np.ones((len(spectrograms), u_max), np.int32)
    padded_labels[:, : encoded.shape[1]] = encoded
    return DeviceDataset(inputs=inputs, input_lengths=input_lengths,
                         labels=padded_labels, label_lengths=label_lengths)


def build_device_dataset(labeled_spectrograms: List[LabeledSpectrogram],
                         codec: GraphemeCodec,
                         compute_dtype=None,
                         mesh=None,
                         shard_over_data_axis: bool = True,
                         time_buckets: Sequence[int] = DEFAULT_TIME_BUCKETS,
                         raw_wave: bool = False) -> Tuple[DeviceDataset, float]:
    """Load every cached feature, pack, and place on device. Returns
    (dataset, resident_megabytes — the GLOBAL footprint; per-chip is that / data_size
    when sharded).

    ``raw_wave=True`` packs (samples, 1) z-normalized waveforms on the sample-count
    bucket grid instead of mel frames (the `use_raw_wave_input` model family) — raw
    16 kHz audio is ~2.5 KB/s at f16, so even waveform corpora sit comfortably in HBM
    and the zero-steady-state-transfer epoch program applies unchanged.

    Under a ``mesh`` the corpus rows shard over the data axis by default
    (``shard_over_data_axis=True``): N data shards hold N x one chip's corpus capacity,
    and the trainer's replicated-index `jnp.take` gathers batch rows over ICI (see
    module docstring). When the row count does not divide the data-axis size, leading
    rows are repeated to pad — a slight oversampling of those examples, vanishing for
    corpus sizes >> mesh size. ``shard_over_data_axis=False`` keeps the round-2
    replicated layout.

    Features ship as f16 when the model computes in bf16 (`w2l.apply` upcasts), halving
    residency and the one-time transfer."""
    import jax.numpy as jnp

    if raw_wave:
        from .batching import RAW_WAVE_SAMPLE_BUCKETS
        if time_buckets is DEFAULT_TIME_BUCKETS:
            time_buckets = RAW_WAVE_SAMPLE_BUCKETS
        spectrograms = [s.z_normalized_raw_wave() for s in labeled_spectrograms]
    else:
        spectrograms = [s.z_normalized_transposed_spectrogram()
                        for s in labeled_spectrograms]
    labels = [s.label for s in labeled_spectrograms]
    dtype = np.float16 if (compute_dtype is not None
                           and compute_dtype == jnp.bfloat16) else np.float32
    host = pack_dataset(spectrograms, labels, codec, time_buckets=time_buckets,
                        dtype=dtype)
    if mesh is None:
        megabytes = host.nbytes() / 1e6
        return DeviceDataset(*(jnp.asarray(f) for f in host)), megabytes

    from jax.sharding import PartitionSpec
    from ..parallel.distributed import put_global
    from ..parallel.mesh import DATA_AXIS
    if shard_over_data_axis:
        data_size = mesh.shape[DATA_AXIS]
        remainder = host.example_count % data_size
        if remainder:
            pad = data_size - remainder
            host = DeviceDataset(*(np.concatenate([f, f[:pad]], axis=0) for f in host))
        specs = [PartitionSpec(DATA_AXIS), PartitionSpec(DATA_AXIS),
                 PartitionSpec(DATA_AXIS), PartitionSpec(DATA_AXIS)]
    else:
        specs = [PartitionSpec()] * 4
    megabytes = host.nbytes() / 1e6
    device = DeviceDataset(*(put_global(mesh, spec, f)
                             for spec, f in zip(specs, host)))
    return device, megabytes
