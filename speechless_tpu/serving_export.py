"""AOT deployment bundles: serialized StableHLO serving programs + weights.

The reference's deployment story is its Keras HDF5 checkpoint plus the Python model code
to rebuild the graph (`net.py:518-530` load_model); serving anywhere means shipping the
whole framework. Here deployment is `jax.export`: every per-bucket transcription program
(feature extraction -> acoustic model -> greedy or LM-fused beam decode, one fused XLA
program per length bucket, see `serving.Transcriber`) serializes to versioned portable
StableHLO with JAX's compatibility guarantees, alongside the weights and a small JSON
manifest. The loader (`ExportedTranscriber`) replays those programs with NO model-building
code — the module never imports the model, the feature pipeline, or the decoders — so a
serving fleet can pin a bundle while training code keeps moving, and a bundle exported
for `platforms=("tpu",)` on a CPU host runs unchanged on the serving TPUs.

Bundle layout::

    <dir>/manifest.json          charset, buckets, platforms, format version
    <dir>/weights-epoch0.npz     params in the standard checkpoint format
    <dir>/program-<bucket>.shlo  one serialized exported program per sample bucket
"""
import json
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from .text.graphemes import CtcGraphemeCodec
from .utils.tools import log, mkdir

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"


def export_transcriber(transcriber, directory: Path,
                       platforms: Optional[Sequence[str]] = None,
                       sample_buckets: Optional[Sequence[int]] = None,
                       batch_sizes: Sequence[int] = (1,),
                       streaming: bool = False,
                       device_streaming: Optional[dict] = None) -> Path:
    """Write an AOT serving bundle for ``transcriber`` (a `serving.Transcriber`).

    ``platforms``: lowering targets (e.g. ``("tpu",)`` to export for TPU serving from a
    CPU build host, or ``("tpu", "cpu")`` for a bundle that runs on both; loading on a
    platform the bundle was not exported for raises). Default is the current backend's
    platform. ``sample_buckets`` defaults to the transcriber's own buckets — pass a
    subset to bound bundle size.

    ``batch_sizes``: additionally export batched programs (one per (bucket, B) pair,
    B > 1) so `ExportedTranscriber.transcribe_batch` can serve offline workloads with
    batched dispatches; (1,) exports only the single-utterance programs.

    ``streaming``: additionally export the per-frame argmax programs
    (`Transcriber.frame_tokens`) so the bundle supports online decoding —
    `serving_streaming.StreamingTranscriber(ExportedTranscriber(dir))`.

    ``device_streaming``: a (possibly empty) dict of
    `serving_device_stream.export_feed_program` kwargs (``window_s``,
    ``chunk_cap_s``, ``max_sessions``, ``max_batch``) — exports the fused
    HBM-resident session-pool feed program so
    `serving_device_stream.DeviceStreamingPool(ExportedTranscriber(dir))` serves
    device-resident streams with no model code. The pool dimensions are baked into
    the program's shapes and recorded in the manifest; ``None`` (default) skips it.

    Caveat: the LM-fused beam picks Pallas-vs-interpreted at trace time from the
    *current* backend (`ops/decode_pallas*.py` ``interpret=``), so export LM-fused
    TPU bundles on a TPU host to capture the Mosaic kernel; a CPU-host export for TPU
    is still correct but bakes the emulated (slower) beam. Greedy bundles are pure XLA
    and lower identically everywhere.
    """
    import jax
    from jax import export as jax_export

    directory = Path(directory)
    mkdir(directory)
    buckets = tuple(sorted(sample_buckets or transcriber.sample_buckets))
    unknown = set(buckets) - set(transcriber.sample_buckets)
    if unknown:
        raise ValueError("sample_buckets {} are not buckets of this transcriber ({})"
                         .format(sorted(unknown), transcriber.sample_buckets))

    params_shapes = jax.tree.map(
        lambda leaf: jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype),
        transcriber.params)
    batch_sizes = tuple(sorted(set(batch_sizes)))
    if any(b < 1 for b in batch_sizes) or 1 not in batch_sizes:
        raise ValueError("batch_sizes must be positive and include 1 (the "
                         "single-utterance programs); got {}".format(batch_sizes))
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    for bucket in buckets:
        for batch in batch_sizes:
            if batch == 1:
                exported = jax_export.export(transcriber._transcribe, **kwargs)(
                    params_shapes,
                    jax.ShapeDtypeStruct((bucket,), np.float32),
                    jax.ShapeDtypeStruct((), np.int32))
                name = "program-{}.shlo".format(bucket)
            else:
                exported = jax_export.export(transcriber._transcribe_batch, **kwargs)(
                    params_shapes,
                    jax.ShapeDtypeStruct((batch, bucket), np.float32),
                    jax.ShapeDtypeStruct((batch,), np.int32))
                name = "program-{}-b{}.shlo".format(bucket, batch)
            blob = exported.serialize()
            (directory / name).write_bytes(blob)
            log("exported bucket {} batch {} for {} ({} KiB)".format(
                bucket, batch, ",".join(exported.platforms), len(blob) // 1024))
        if streaming:
            exported = jax_export.export(transcriber._frame_tokens, **kwargs)(
                params_shapes,
                jax.ShapeDtypeStruct((bucket,), np.float32),
                jax.ShapeDtypeStruct((), np.int32))
            (directory / "frames-{}.shlo".format(bucket)).write_bytes(
                exported.serialize())
            # Per-frame posteriors: what forced alignment (`serving.align_audio`,
            # CLI `align --bundle`) and beam-mode streaming partials
            # (`serving_streaming` partial_decode="beam") consume.
            exported = jax_export.export(transcriber._frame_log_probs, **kwargs)(
                params_shapes,
                jax.ShapeDtypeStruct((bucket,), np.float32),
                jax.ShapeDtypeStruct((), np.int32))
            (directory / "posteriors-{}.shlo".format(bucket)).write_bytes(
                exported.serialize())

    feed_spec = None
    if device_streaming is not None:
        from .serving_device_stream import export_feed_program
        exported, feed_spec = export_feed_program(
            transcriber, platforms=(list(platforms) if platforms else None),
            **device_streaming)
        blob = exported.serialize()
        (directory / "feed.shlo").write_bytes(blob)
        log("exported device-stream feed program (window={} max_sessions={}, "
            "{} KiB)".format(feed_spec["window"], feed_spec["max_sessions"],
                             len(blob) // 1024))

    from .train.checkpoint import save_checkpoint
    save_checkpoint(directory, epoch=0, params=transcriber.params)
    (directory / _MANIFEST).write_text(json.dumps({
        "format_version": FORMAT_VERSION,
        "allowed_characters": list(transcriber.codec.allowed_characters),
        "sample_buckets": list(buckets),
        "batch_sizes": list(batch_sizes),
        "platforms": (list(platforms) if platforms is not None
                      else [jax.default_backend()]),
        "lm_fused": transcriber.word_lm is not None,
        "quantized": bool(getattr(transcriber, "quantized", False)),
        "streaming": bool(streaming),
        "streaming_posteriors": bool(streaming),
        "device_streaming": feed_spec,
        "samples_per_frame": transcriber.samples_per_frame,
        "blank_index": transcriber.blank_index,
    }, indent=2))
    return directory


class ExportedTranscriber:
    """Serve from an AOT bundle with no model code.

    Mirrors `serving.Transcriber.transcribe_audio` (pad to bucket -> one device call ->
    token decode) but every device program is a deserialized `jax.export` artifact.
    """

    def __init__(self, directory: Path):
        from jax import export as jax_export
        from .train.checkpoint import load_params

        directory = Path(directory)
        manifest = json.loads((directory / _MANIFEST).read_text())
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError("bundle format {} is newer than this loader ({})"
                             .format(manifest["format_version"], FORMAT_VERSION))
        self.manifest = manifest
        self.codec = CtcGraphemeCodec(list(manifest["allowed_characters"]))
        self.sample_buckets = tuple(manifest["sample_buckets"])
        self.params = load_params(directory, epoch=0)
        self.batch_sizes = tuple(manifest.get("batch_sizes", [1]))
        self._programs = {
            bucket: jax_export.deserialize(
                (directory / "program-{}.shlo".format(bucket)).read_bytes())
            for bucket in self.sample_buckets}
        self._batch_programs = {
            (bucket, batch): jax_export.deserialize(
                (directory / "program-{}-b{}.shlo".format(bucket, batch)).read_bytes())
            for bucket in self.sample_buckets
            for batch in self.batch_sizes if batch > 1}
        self._frame_programs = {
            bucket: jax_export.deserialize(
                (directory / "frames-{}.shlo".format(bucket)).read_bytes())
            for bucket in self.sample_buckets} if manifest.get("streaming") else {}
        # Per-frame posteriors (forced alignment + beam-mode streaming); bundles
        # exported before the posterior programs existed lack the manifest flag.
        self._posterior_programs = {
            bucket: jax_export.deserialize(
                (directory / "posteriors-{}.shlo".format(bucket)).read_bytes())
            for bucket in self.sample_buckets
        } if manifest.get("streaming_posteriors") else {}
        # Device-resident streaming (`serving_device_stream.DeviceStreamingPool`
        # duck-types on these two attributes): the fused feed program plus the pool
        # dimensions baked into its shapes.
        self.device_feed_spec = manifest.get("device_streaming")
        self.device_feed_program = (
            jax_export.deserialize((directory / "feed.shlo").read_bytes())
            if self.device_feed_spec else None)

    @property
    def supports_posteriors(self) -> bool:
        """Whether `frame_log_probs` is actually servable — bundles exported without
        ``streaming=True`` ship no posterior programs. The PUBLIC predicate for
        beam-partial streaming and `align` (callers must not probe the private
        program dict)."""
        return bool(self._posterior_programs)

    def transcribe_audio(self, audio: np.ndarray) -> str:
        """Transcribe a mono 16 kHz float32 waveform."""
        return self.transcribe_audio_with_confidence(audio)[0]

    def transcribe_audio_with_confidence(self, audio: np.ndarray):
        """``(text, confidence)`` — same contract as
        `serving.Transcriber.transcribe_audio_with_confidence`."""
        import jax.numpy as jnp

        length = len(audio)
        # Unlike the live Transcriber (which jit-compiles a fresh program for oversize
        # audio), a bundle only contains its exported buckets.
        bucket = next((b for b in self.sample_buckets if length <= b), None)
        if bucket is None:
            raise ValueError(
                "audio of {} samples exceeds the largest exported bucket ({}); "
                "re-export with a larger sample_buckets entry or segment the audio"
                .format(length, self.sample_buckets[-1]))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        tokens, count, confidence = self._programs[bucket].call(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        tokens = np.asarray(tokens)[: int(count)]
        return (self.codec.decode_graphemes(tokens.tolist(), merge_repeated=False),
                float(confidence))

    def transcribe_file(self, path: Path, sample_rate: int = 16000) -> str:
        from .features import audio_io
        return self.transcribe_audio(audio_io.load_audio(path, sample_rate))

    @property
    def samples_per_frame(self) -> int:
        return self.manifest["samples_per_frame"]

    @property
    def blank_index(self) -> int:
        return self.manifest["blank_index"]

    @property
    def seconds_per_frame(self) -> float:
        """Duration of one output frame at the framework-wide 16 kHz sample rate."""
        return self.samples_per_frame / 16000.0

    @property
    def has_batched_programs(self) -> bool:
        """Whether `transcribe_batch` can run: bundles only carry the batch sizes they
        were exported with (default is single-utterance programs only)."""
        return any(batch > 1 for batch in self.batch_sizes)

    def transcribe_long_audio(self, audio: np.ndarray, max_segment_s: float = 30.0,
                              min_silence_s: float = 0.25) -> str:
        """Long-form transcription from a bundle: same silence segmentation as
        `serving.Transcriber.transcribe_long_audio`, with segments additionally capped
        at the largest exported bucket (a bundle cannot jit-compile an oversize
        program the way the live transcriber can)."""
        from .serving import split_long_audio

        max_segment_s = min(max_segment_s, self.sample_buckets[-1] / 16000.0)
        texts = [self.transcribe_audio(segment) for segment in
                 split_long_audio(audio, max_segment_s, min_silence_s)]
        return " ".join(text for text in texts if text)

    def frame_tokens(self, audio: np.ndarray) -> np.ndarray:
        """Per-frame argmax tokens from the bundle's streaming programs — lets
        `serving_streaming.StreamingTranscriber` run on an exported bundle."""
        import jax.numpy as jnp

        if not self._frame_programs:
            raise ValueError("bundle has no streaming programs; re-export with "
                             "streaming=True")
        length = len(audio)
        bucket = next((b for b in self.sample_buckets if length <= b), None)
        if bucket is None:
            raise ValueError(
                "audio of {} samples exceeds the largest exported bucket ({})"
                .format(length, self.sample_buckets[-1]))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        frames, count = self._frame_programs[bucket].call(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        return np.asarray(frames)[: int(count)]

    def frame_log_probs(self, audio: np.ndarray) -> np.ndarray:
        """Per-frame log posteriors ``(frames, classes)`` from the bundle — same
        contract as `serving.Transcriber.frame_log_probs`, enabling forced alignment
        (`serving.align_audio`, CLI ``align --bundle``) and beam-mode streaming
        partials on an exported bundle."""
        import jax.numpy as jnp

        if not self._posterior_programs:
            raise ValueError("bundle has no posterior programs; re-export with "
                             "streaming=True (bundles exported before posterior "
                             "programs existed need a re-export)")
        length = len(audio)
        bucket = next((b for b in self.sample_buckets if length <= b), None)
        if bucket is None:
            raise ValueError(
                "audio of {} samples exceeds the largest exported bucket ({})"
                .format(length, self.sample_buckets[-1]))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        log_probs, count = self._posterior_programs[bucket].call(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        return np.asarray(log_probs)[: int(count)]

    def transcribe_batch(self, audios: Sequence[np.ndarray]):
        """Offline throughput from a bundle: same grouping contract as
        `serving.Transcriber.transcribe_batch`, using the bundle's exported batched
        programs (largest exported batch size per dispatch). Requires the bundle to
        have been exported with ``batch_sizes`` beyond 1."""
        import jax.numpy as jnp

        batched = [b for b in self.batch_sizes if b > 1]
        if not batched:
            raise ValueError("bundle has no batched programs; re-export with "
                             "batch_sizes=(1, N)")
        from .serving import grouped_padded_batches

        batch_size = max(batched)

        def bucket_fn(length: int) -> int:
            bucket = next((b for b in self.sample_buckets if length <= b), None)
            if bucket is None:
                raise ValueError(
                    "audio of {} samples exceeds the largest exported bucket ({})"
                    .format(length, self.sample_buckets[-1]))
            return bucket

        results: List[Optional[tuple]] = [None] * len(audios)
        for group, wavs, lengths in grouped_padded_batches(audios, bucket_fn,
                                                           batch_size):
            program = self._batch_programs[(wavs.shape[1], batch_size)]
            tokens, counts, confidences = program.call(
                self.params, jnp.asarray(wavs), jnp.asarray(lengths))
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            confidences = np.asarray(confidences)
            for row, index in enumerate(group):
                text = self.codec.decode_graphemes(
                    tokens[row, : int(counts[row])].tolist(), merge_repeated=False)
                results[index] = (text, float(confidences[row]))
        return results
