"""Low-latency inference: a compiled transcriber for production serving.

The reference's predict path rebuilt host-side batches through Keras session runs; here a
`Transcriber` holds one jitted wav -> tokens function per length bucket (feature extraction,
acoustic model, and greedy decode fused into a single device program), so a transcription
request costs one host->device transfer + one program + one small fetch. Covers the
BASELINE.json "p50 predict latency" axis.
"""
import threading
import time
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .data.batching import DEFAULT_TIME_BUCKETS, bucket_length
from .features import audio_io
from .models import wav2letter as w2l
from .ops.decode import greedy_decode
from .text.graphemes import CtcGraphemeCodec


def words_from_frame_tokens(frames: np.ndarray, codec: CtcGraphemeCodec,
                            blank_index: int, seconds_per_frame: float
                            ) -> List[Tuple[str, float, float]]:
    """Word-level timestamps ``[(word, start_s, end_s), ...]`` from uncollapsed
    per-frame argmax tokens (CTC emission times: each word spans its first to last
    non-blank character emission). Shared by the live `Transcriber` and by bundle-based
    serving (`serving_export.ExportedTranscriber` exposes the same `frame_tokens`)."""
    space = codec.allowed_characters.index(" ") \
        if " " in codec.allowed_characters else -1
    words: List[Tuple[str, float, float]] = []
    chars: List[str] = []
    start_frame = None
    last_frame = 0
    previous = -1
    for f, token in enumerate(np.asarray(frames).tolist()):
        if token != previous and token != blank_index:
            if token == space:
                if chars:
                    words.append(("".join(chars), start_frame * seconds_per_frame,
                                  (last_frame + 1) * seconds_per_frame))
                chars, start_frame = [], None
            else:
                chars.append(codec.decode_graphemes([token], merge_repeated=False))
                if start_frame is None:
                    start_frame = f
                last_frame = f
        previous = token
    if chars:
        words.append(("".join(chars), start_frame * seconds_per_frame,
                      (last_frame + 1) * seconds_per_frame))
    return words


def align_audio(backend, audio: np.ndarray, transcript: str) -> List[dict]:
    """Forced alignment over any serving backend exposing ``frame_log_probs`` /
    ``codec`` / ``blank_index`` / ``seconds_per_frame`` (the live `Transcriber` or an
    AOT bundle exported with streaming posteriors). See
    `Transcriber.align_audio` for semantics."""
    import jax.numpy as jnp

    from .ops.forced_align import ctc_forced_align, word_spans_from_alignment

    # External transcripts routinely carry punctuation/digits outside the model's
    # alphabet; strip them (collapsing any whitespace runs the stripping opens up)
    # instead of letting the strict codec raise "Unexpected char" from deep inside.
    text = transcript.lower()
    allowed = set(backend.codec.allowed_characters)
    if any(c not in allowed for c in text):
        text = "".join(c if c in allowed else " " for c in text)
        if " " in allowed:
            text = " ".join(text.split())
        else:
            text = text.replace(" ", "")
    if not text:
        if transcript.strip():
            raise ValueError(
                "transcript has no characters in the model alphabet ({!r}); "
                "got {!r}".format(backend.codec.allowed_characters, transcript))
        return []
    tokens = backend.codec.encode(text)
    if not tokens:
        return []
    log_probs = backend.frame_log_probs(audio)
    starts, ends, score = ctc_forced_align(
        jnp.asarray(log_probs[None]), jnp.asarray([log_probs.shape[0]]),
        jnp.asarray(np.asarray(tokens, np.int32)[None]),
        jnp.asarray([len(tokens)]), blank=backend.blank_index)
    if float(score[0]) <= -1e29:
        raise ValueError(
            "transcript cannot be aligned: {} labels need more than the "
            "{} output frames available".format(len(tokens), log_probs.shape[0]))
    return word_spans_from_alignment(backend.codec, tokens,
                                     np.asarray(starts)[0], np.asarray(ends)[0],
                                     backend.seconds_per_frame)


def grouped_padded_batches(audios: Sequence[np.ndarray], bucket_fn, batch_size: int):
    """Yield ``(indices, wavs, lengths)`` batches for a batched device dispatch.

    The shared grouping contract of every offline batch surface
    (`Transcriber.transcribe_batch`, `Transcriber.frame_tokens_batch`,
    `serving_export.ExportedTranscriber.transcribe_batch`): utterances grouped by
    sample bucket (``bucket_fn(num_samples) -> bucket``), served ``batch_size`` rows
    per dispatch, short final groups zero-padded up to ``batch_size`` so exactly one
    program compiles per touched bucket. ``wavs`` is ``(batch_size, bucket)`` float32,
    ``lengths`` int32; ``indices`` maps rows back to input positions.
    """
    by_bucket: dict = {}
    for index, audio in enumerate(audios):
        by_bucket.setdefault(bucket_fn(len(audio)), []).append(index)
    for bucket, indices in sorted(by_bucket.items()):
        for group_start in range(0, len(indices), batch_size):
            group = indices[group_start:group_start + batch_size]
            wavs = np.zeros((batch_size, bucket), dtype=np.float32)
            lengths = np.zeros(batch_size, dtype=np.int32)
            for row, index in enumerate(group):
                audio = audios[index]
                wavs[row, :len(audio)] = audio
                lengths[row] = len(audio)
            yield group, wavs, lengths


def split_long_audio(audio: np.ndarray, max_segment_s: float = 30.0,
                     min_silence_s: float = 0.25) -> List[np.ndarray]:
    """Split long audio into <= ``max_segment_s`` segments, cutting at the quietest
    window in the last third of each segment so cuts land in silences rather than
    mid-word. Shared by the live `Transcriber` and bundle-based serving
    (`serving_export.ExportedTranscriber`); the reference instead caps utterances at
    35 s at corpus level (`german_corpus.py:80`) and cannot serve longer recordings."""
    sample_rate = 16000
    max_samples = int(max_segment_s * sample_rate)
    if len(audio) <= max_samples:
        return [audio]
    window = int(min_silence_s * sample_rate)
    segments: List[np.ndarray] = []
    start = 0
    while start < len(audio):
        end = min(start + max_samples, len(audio))
        if end < len(audio):
            search_from = start + (2 * (end - start)) // 3
            tail = np.abs(audio[search_from:end])
            if len(tail) > window:
                energies = np.convolve(tail, np.ones(window), mode="valid")
                cut = search_from + int(np.argmin(energies)) + window // 2
                if cut > start + window:
                    end = cut
        segments.append(audio[start:end])
        start = end
    return segments


class Transcriber:
    """Serve transcriptions from a trained wav2letter checkpoint."""

    def __init__(self, config: w2l.Wav2LetterConfig, params: w2l.Params,
                 allowed_characters: List[str],
                 sample_buckets: Sequence[int] = tuple(b * 128 for b in DEFAULT_TIME_BUCKETS),
                 kenlm_directory: Optional[Path] = None,
                 beam_width: int = 25,
                 lm_weight: float = 0.8,
                 word_count_weight: float = 0.0,
                 valid_word_count_weight: float = 2.3,
                 prune_classes: Optional[int] = 8,
                 quantize_weights: bool = False,
                 int8_compute: bool = False,
                 lexicon_constrained: bool = False,
                 mesh=None):
        """``kenlm_directory``: serve LM-fused transcriptions — the word n-gram rides in
        HBM (`lm/device_lm.py`) and the beam runs inside the same device program as the
        features and the acoustic model, so fusion costs no extra host round-trip.

        ``mesh``: DP-sharded batched serving — every batched program
        (`transcribe_batch`, `frame_tokens_batch`, `frame_log_probs_batch`) shards
        its batch axis ``P('data')`` over the mesh, so offline eval and the
        streaming pools' window dispatches scale with the slice instead of leaving
        n-1 chips idle (the training side already shards corpora this way,
        `data/device_dataset.py`). Params are replicated over the mesh; batch
        sizes must divide the data-axis size. Single-utterance programs are
        unchanged.

        ``quantize_weights``: serve from int8 per-channel weights (`models/quantize.py`)
        — 4x less HBM weight traffic per request and 4x smaller exported bundles;
        dequantization fuses into the conv reads inside the program.

        ``int8_compute``: additionally run the wide convs as int8 x int8 -> int32
        convolutions on the MXU (v5e: 2x the bf16 peak) with dynamic per-tensor
        activation quantization — the batched-offline-throughput lever; implies
        ``quantize_weights``. See `Wav2LetterConfig.int8_compute`.

        ``lexicon_constrained``: restrict the LM beam to vocabulary words (character
        extensions must stay on the trie, spaces only terminate complete words) —
        wav2letter's lexicon decode mode; requires ``kenlm_directory``."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        if int8_compute:
            quantize_weights = True
            config = dataclasses.replace(config, int8_compute=True)
        self.config = config
        if quantize_weights:
            from .models.quantize import quantize_params_int8
            params = quantize_params_int8(params)
        self.quantized = quantize_weights
        self.int8_compute = int8_compute
        # Pin the weights in HBM once: passing host (numpy) leaves to a jitted call
        # re-uploads them EVERY request (the quantizer returns numpy; measured 605 ms
        # of pure transfer per int8 request over a 37 MB/s tunneled link vs 2 ms with
        # device-resident weights). With a mesh: replicated over it, and batched
        # inputs are placed batch-sharded (`_put_batch`) so GSPMD partitions every
        # batched program over the data axis.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from .parallel.mesh import DATA_AXIS

            self._data_parallelism = mesh.shape[DATA_AXIS]
            self.params = jax.device_put(params, NamedSharding(mesh,
                                                               PartitionSpec()))
            self._batch_sharding = NamedSharding(mesh,
                                                 PartitionSpec(DATA_AXIS, None))
            self._row_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        else:
            self.params = jax.device_put(params)
        self.codec = CtcGraphemeCodec(allowed_characters)
        self.sample_buckets = tuple(sorted(sample_buckets))
        self._jnp = jnp
        if kenlm_directory is not None:
            from .lm.device_lm import build_device_word_lm
            from .lm.ngram import load_language_model

            arpa = load_language_model(Path(kenlm_directory), prefer_native=False)
            if arpa is None:
                raise FileNotFoundError(
                    "No ARPA language model in {}".format(kenlm_directory))
            word_lm = build_device_word_lm(arpa, allowed_characters).as_device()
        else:
            word_lm = None
        if lexicon_constrained and word_lm is None:
            raise ValueError("lexicon_constrained requires kenlm_directory (the "
                             "vocabulary trie rides in the word LM)")
        self.word_lm = word_lm
        self.lexicon_constrained = lexicon_constrained

        def transcribe_batch_fn(params, wavs, lengths):
            from .features.spectrogram import features_batch
            from .ops.device_beam import beam_search_decode_device

            features, frame_counts = features_batch(wavs, lengths)
            logits = w2l.apply(config, params, features)
            logit_lengths = w2l.prediction_lengths(config, frame_counts)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            # Decode confidence: mean per-frame max posterior over the real frames —
            # the standard CTC proxy (1.0 = the model is certain frame-by-frame; near
            # 1/classes = uniform). Rides in the same program; costs one reduce.
            frames = jnp.arange(log_probs.shape[1])[None, :]
            in_range = frames < logit_lengths[:, None]
            frame_max = jnp.exp(jnp.max(log_probs, axis=-1))
            confidence = (jnp.sum(jnp.where(in_range, frame_max, 0.0), axis=1)
                          / jnp.maximum(logit_lengths, 1))
            if word_lm is not None:
                # Routed to the LM-fused Pallas beam when the charset fits the packed
                # frame row; falls back to the XLA beam otherwise (ops/device_beam.py).
                tokens, counts = beam_search_decode_device(
                    log_probs, logit_lengths, blank=config.grapheme_set_size - 1,
                    beam_width=beam_width, word_lm=word_lm, lm_weight=lm_weight,
                    word_count_weight=word_count_weight,
                    valid_word_count_weight=valid_word_count_weight,
                    prune_classes=prune_classes,
                    lexicon_constrained=lexicon_constrained,
                    # CTC emits at most one grapheme per frame, so the frame count
                    # is the exact cap; the default 256 silently truncates dense
                    # speech on long buckets (the beam only stores backpointers, so
                    # a larger cap costs one gather at backtrace time).
                    max_decoded_length=log_probs.shape[1])
            else:
                tokens, counts = greedy_decode(log_probs, logit_lengths,
                                               config.grapheme_set_size - 1)
            return tokens, counts, confidence

        def transcribe_fn(params, wav, length):
            tokens, counts, confidence = transcribe_batch_fn(
                params, wav[None], length[None])
            return tokens[0], counts[0], confidence[0]

        def frame_tokens_batch_fn(params, wavs, lengths):
            # Per-frame argmax tokens + frame counts (no collapse): the streaming
            # decoder (serving_streaming.py) merges repeats across window boundaries
            # itself, so it needs raw frame-level decisions, not collapsed tokens.
            from .features.spectrogram import features_batch

            features, frame_counts = features_batch(wavs, lengths)
            logits = w2l.apply(config, params, features)
            frames = jnp.argmax(logits, axis=-1)
            return frames, w2l.prediction_lengths(config, frame_counts)

        def frame_tokens_fn(params, wav, length):
            frames, counts = frame_tokens_batch_fn(params, wav[None], length[None])
            return frames[0], counts[0]

        def frame_log_probs_batch_fn(params, wavs, lengths):
            # Per-frame log posteriors (no collapse, no argmax): the incremental
            # streaming BEAM (serving_streaming partial_decode="beam") advances its
            # carried prefix-beam state over exactly the finalized frame rows, so it
            # needs the full distributions, not just frame decisions.
            from .features.spectrogram import features_batch

            features, frame_counts = features_batch(wavs, lengths)
            logits = w2l.apply(config, params, features)
            return (jax.nn.log_softmax(logits, axis=-1),
                    w2l.prediction_lengths(config, frame_counts))

        def frame_log_probs_fn(params, wav, length):
            log_probs, counts = frame_log_probs_batch_fn(params, wav[None],
                                                         length[None])
            return log_probs[0], counts[0]

        self._transcribe = jax.jit(transcribe_fn)
        self._transcribe_batch = jax.jit(transcribe_batch_fn)
        self._frame_tokens = jax.jit(frame_tokens_fn)
        self._frame_tokens_batch = jax.jit(frame_tokens_batch_fn)
        self._frame_log_probs = jax.jit(frame_log_probs_fn)
        self._frame_log_probs_batch = jax.jit(frame_log_probs_batch_fn)

        # N-best decoding (`transcribe_nbest`): one jitted program per n, built lazily —
        # most deployments never request it, and each n is a different static shape.
        self._decoder = dict(beam_width=beam_width, lm_weight=lm_weight,
                             word_count_weight=word_count_weight,
                             valid_word_count_weight=valid_word_count_weight,
                             prune_classes=prune_classes)
        self._nbest_programs = {}
        self._nbest_lock = threading.Lock()  # direct multi-threaded callers: build once
        self._sp_programs = {}  # (mesh id, bucket) -> fused long-form SPMD program
        self._default_sp_mesh = None
        self._jax = jax

    @property
    def beam_width(self) -> int:
        """The decoder's beam width — also the upper bound for ``transcribe_nbest``."""
        return self._decoder["beam_width"]

    def _nbest_program(self, nbest: int):
        with self._nbest_lock:
            return self._nbest_program_locked(nbest)

    def _nbest_program_locked(self, nbest: int):
        if nbest not in self._nbest_programs:
            jax, config, word_lm = self._jax, self.config, self.word_lm
            decoder = self._decoder

            def nbest_fn(params, wav, length):
                from .features.spectrogram import features_batch
                from .ops.decode_jax import beam_search_nbest_jax

                features, frame_counts = features_batch(wav[None], length[None])
                logits = w2l.apply(config, params, features)
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                logit_lengths = w2l.prediction_lengths(config, frame_counts)
                tokens, counts, scores = beam_search_nbest_jax(
                    log_probs, logit_lengths, blank=config.grapheme_set_size - 1,
                    nbest=nbest, beam_width=decoder["beam_width"], word_lm=word_lm,
                    lm_weight=decoder["lm_weight"] if word_lm is not None else 0.0,
                    word_count_weight=decoder["word_count_weight"],
                    valid_word_count_weight=decoder["valid_word_count_weight"],
                    prune_classes=decoder["prune_classes"],
                    lexicon_constrained=self.lexicon_constrained)
                return tokens[0], counts[0], scores[0]

            self._nbest_programs[nbest] = jax.jit(nbest_fn)
        return self._nbest_programs[nbest]

    def transcribe_nbest(self, audio: np.ndarray, nbest: int = 5):
        """The ``nbest`` most probable transcriptions with their total path scores
        (acoustic log prob + weighted LM terms when serving with a language model),
        descending — the reference's TF decoder exposed this as ``top_paths``.

        Runs the XLA beam (`ops/decode_jax.py::beam_search_nbest_jax`) in its own fused
        wav->hypotheses program. Returns up to ``nbest`` ``(text, score)`` pairs —
        fewer when the search holds fewer live prefixes (very short audio)."""
        jnp = self._jnp
        length = len(audio)
        bucket = self._bucket(length)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        tokens, counts, scores = self._nbest_program(nbest)(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        tokens, counts, scores = np.asarray(tokens), np.asarray(counts), np.asarray(scores)
        hypotheses = []
        seen_texts = set()
        for i in range(tokens.shape[0]):
            if scores[i] <= -1e29:
                continue  # dead beam: fewer live prefixes than requested
            text = self.codec.decode_graphemes(
                tokens[i, : int(counts[i])].tolist(), merge_repeated=False)
            # Beams are distinct decoded strings by construction (hash merge); the
            # guard only protects against 32-bit hash collisions.
            if text in seen_texts:
                continue
            seen_texts.add(text)
            hypotheses.append((text, float(scores[i])))
        return hypotheses

    @staticmethod
    def from_checkpoint(net_directory: Path, epoch: int, allowed_characters: List[str],
                        mel_frequency_count: int = 128,
                        kenlm_directory: Optional[Path] = None,
                        quantize_weights: bool = False,
                        int8_compute: bool = False,
                        lexicon_constrained: bool = False,
                        **config_kwargs) -> "Transcriber":
        from .train.checkpoint import load_params

        config = w2l.Wav2LetterConfig(
            input_size_per_time_step=mel_frequency_count,
            grapheme_set_size=len(allowed_characters) + 1, **config_kwargs)
        return Transcriber(config, load_params(net_directory, epoch, config=config),
                           allowed_characters,
                           kenlm_directory=kenlm_directory,
                           quantize_weights=quantize_weights,
                           int8_compute=int8_compute,
                           lexicon_constrained=lexicon_constrained)

    def _bucket(self, num_samples: int) -> int:
        return bucket_length(num_samples, self.sample_buckets, fallback_multiple=65536)

    def _put_batch(self, wavs: np.ndarray, lengths: np.ndarray):
        """Place one padded batch for dispatch: plain uploads without a mesh;
        batch-sharded ``P('data')`` placements with one (GSPMD partitions the
        batched program to match — the DP-serving path)."""
        jnp = self._jnp
        if self.mesh is None:
            return jnp.asarray(wavs), jnp.asarray(lengths)
        if wavs.shape[0] % self._data_parallelism:
            raise ValueError(
                "batch size {} does not divide the mesh's data parallelism {}; "
                "pick a divisible batch_size for DP-sharded serving".format(
                    wavs.shape[0], self._data_parallelism))
        return (self._jax.device_put(wavs, self._batch_sharding),
                self._jax.device_put(lengths, self._row_sharding))

    def transcribe_audio(self, audio: np.ndarray) -> str:
        """Transcribe a mono 16 kHz float32 waveform."""
        return self.transcribe_audio_with_confidence(audio)[0]

    def transcribe_audio_with_confidence(self, audio: np.ndarray) -> Tuple[str, float]:
        """Returns ``(text, confidence)``: confidence is the mean per-frame max
        posterior in (0, 1] — near 1 when the acoustic model is certain, near the
        uniform 1/classes floor when it is guessing. Computed inside the same device
        program as the transcription (no extra dispatch)."""
        jnp = self._jnp
        length = len(audio)
        bucket = self._bucket(length)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        tokens, count, confidence = self._transcribe(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        tokens = np.asarray(tokens)[: int(count)]
        return (self.codec.decode_graphemes(tokens.tolist(), merge_repeated=False),
                float(confidence))

    def transcribe_file(self, path: Path, sample_rate: int = 16000) -> str:
        return self.transcribe_audio(audio_io.load_audio(path, sample_rate))

    def frame_tokens(self, audio: np.ndarray) -> np.ndarray:
        """Per-frame argmax grapheme indices (uncollapsed) for ``audio`` — the raw
        frame decisions the streaming decoder merges across window boundaries."""
        jnp = self._jnp
        length = len(audio)
        bucket = self._bucket(length)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        frames, count = self._frame_tokens(self.params, jnp.asarray(padded),
                                           jnp.asarray(length, jnp.int32))
        return np.asarray(frames)[: int(count)]

    def frame_tokens_batch(self, audios: Sequence[np.ndarray],
                           batch_size: int = 16) -> List[np.ndarray]:
        """Uncollapsed per-frame argmax tokens for many windows in batched dispatches
        (the multi-stream streaming path: N concurrent streams' windows share one
        device program instead of N dispatches). Grouping/padding rules match
        `transcribe_batch`; returns one trimmed frame array per input, in order."""
        jnp = self._jnp
        results: List[Optional[np.ndarray]] = [None] * len(audios)
        for group, wavs, lengths in grouped_padded_batches(audios, self._bucket,
                                                           batch_size):
            wavs, lengths = self._put_batch(wavs, lengths)
            frames, counts = self._frame_tokens_batch(self.params, wavs, lengths)
            frames = np.asarray(frames)
            counts = np.asarray(counts)
            for row, index in enumerate(group):
                results[index] = frames[row, : int(counts[row])]
        return results

    def frame_log_probs(self, audio: np.ndarray) -> np.ndarray:
        """Per-frame log posteriors ``(frames, classes)`` for ``audio`` (uncollapsed)
        — what the streaming beam consumes (`serving_streaming`, partial_decode=
        "beam"). Same padding/bucketing as `frame_tokens`."""
        jnp = self._jnp
        length = len(audio)
        bucket = self._bucket(length)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        log_probs, count = self._frame_log_probs(self.params, jnp.asarray(padded),
                                                 jnp.asarray(length, jnp.int32))
        return np.asarray(log_probs)[: int(count)]

    def frame_log_probs_batch(self, audios: Sequence[np.ndarray],
                              batch_size: int = 16) -> List[np.ndarray]:
        """Per-frame log posteriors for many windows in batched dispatches (the
        multi-stream beam-partials path). Grouping/padding rules match
        `frame_tokens_batch`; one trimmed (frames, classes) array per input."""
        jnp = self._jnp
        results: List[Optional[np.ndarray]] = [None] * len(audios)
        for group, wavs, lengths in grouped_padded_batches(audios, self._bucket,
                                                           batch_size):
            wavs, lengths = self._put_batch(wavs, lengths)
            log_probs, counts = self._frame_log_probs_batch(self.params, wavs,
                                                            lengths)
            log_probs = np.asarray(log_probs)
            counts = np.asarray(counts)
            for row, index in enumerate(group):
                results[index] = log_probs[row, : int(counts[row])]
        return results

    @property
    def supports_posteriors(self) -> bool:
        """Live backends always serve per-frame posteriors (`frame_log_probs`
        jit-compiles on demand) — the public predicate shared with
        `ExportedTranscriber.supports_posteriors`."""
        return True

    @property
    def samples_per_frame(self) -> int:
        """Input samples per output frame: the 128-sample feature hop times the conv
        stack's stride ratio."""
        return 128 * self.config.input_to_prediction_length_ratio

    @property
    def blank_index(self) -> int:
        return self.config.grapheme_set_size - 1

    @property
    def seconds_per_frame(self) -> float:
        """Duration of one output frame at the framework-wide 16 kHz sample rate."""
        return self.samples_per_frame / 16000.0

    @property
    def has_batched_programs(self) -> bool:
        """Whether `transcribe_batch` can serve multi-utterance dispatches. Always true
        for the live transcriber (programs jit-compile on demand); bundle backends
        report their exported batch sizes instead."""
        return True

    def transcribe_audio_with_timestamps(self, audio: np.ndarray
                                         ) -> List[Tuple[str, float, float]]:
        """Word-level timestamps: ``[(word, start_s, end_s), ...]`` from the greedy
        frame decisions (CTC emission times — each word spans its first to last
        non-blank character emission; the reference tracks word positions only for
        corpus labels, `labeled_example.py` PositionalLabel, never for predictions)."""
        return words_from_frame_tokens(self.frame_tokens(audio), self.codec,
                                       self.blank_index,
                                       self.samples_per_frame / 16000.0)

    def align_audio(self, audio: np.ndarray, transcript: str) -> List[dict]:
        """Forced alignment: word timestamps for a KNOWN transcript —
        ``[{"word", "start_s", "end_s"}, ...]`` from the maximum-score Viterbi path
        through the transcript's CTC lattice (`ops/forced_align.py`). This produces
        the word-position data the reference only consumes as corpus annotations
        (`labeled_example.py:32-60` PositionalLabel); use it to position-label
        corpora that ship plain transcripts, or to caption with exact words.

        Raises ValueError when the transcript cannot be aligned (more labels than
        the audio has output frames)."""
        return align_audio(self, audio, transcript)

    def transcribe_batch(self, audios: Sequence[np.ndarray],
                         batch_size: int = 16) -> List[Tuple[str, float]]:
        """Offline throughput path: transcribe many waveforms with batched device
        programs instead of one dispatch per utterance.

        Utterances are grouped by sample bucket and decoded ``batch_size`` at a time
        (short final groups zero-pad up to ``batch_size``, so exactly one program
        compiles per touched bucket). Returns ``(text, confidence)`` per input, in
        input order. On the tunneled benchmark chip a dispatch costs ~24 ms of RTT
        alone — batching amortizes it ``batch_size``-fold.
        """
        jnp = self._jnp
        results: List[Optional[Tuple[str, float]]] = [None] * len(audios)
        for group, wavs, lengths in grouped_padded_batches(audios, self._bucket,
                                                           batch_size):
            wavs, lengths = self._put_batch(wavs, lengths)
            tokens, counts, confidences = self._transcribe_batch(
                self.params, wavs, lengths)
            tokens = np.asarray(tokens)
            counts = np.asarray(counts)
            confidences = np.asarray(confidences)
            for row, index in enumerate(group):
                text = self.codec.decode_graphemes(
                    tokens[row, : int(counts[row])].tolist(),
                    merge_repeated=False)
                results[index] = (text, float(confidences[row]))
        return results

    def warm_up(self, durations_s: Optional[Sequence[float]] = None) -> None:
        """Compile the per-bucket programs ahead of serving.

        By default warms every bucket in ``self.sample_buckets`` (a cold compile at request
        time can take minutes on remote-compiled backends); pass explicit durations to warm
        a subset only."""
        if durations_s is not None:
            lengths = [int(d * 16000) for d in durations_s]
        else:
            lengths = list(self.sample_buckets)
        for length in lengths:
            self.transcribe_audio(np.zeros(length, np.float32))

    def transcribe_long_audio(self, audio: np.ndarray, max_segment_s: float = 30.0,
                              silence_threshold: float = 0.02,
                              min_silence_s: float = 0.25,
                              sequence_parallel: bool = False,
                              mesh=None) -> str:
        """Transcribe arbitrarily long audio.

        Default: segment at silences. The reference caps utterances at 35 s
        (`german_corpus.py:80`); here long-form audio is split at low-energy regions
        into <= ``max_segment_s`` chunks (bounding device memory and per-segment
        latency), each transcribed independently and joined.

        ``sequence_parallel=True`` (or an explicit ``mesh``): the TPU-native
        alternative the reference cannot express — the TIME axis of the WHOLE
        recording is sharded over the device mesh (`parallel/sequence.py`: conv
        halos ppermute'd over ICI, outputs bit-identical to the unsharded forward),
        features + acoustic model + decode fused into ONE SPMD dispatch. No
        segmentation, no silence heuristics, no per-segment RTTs; per-chip HBM
        scales as T/n. Decodes with the transcriber's configured decoder (greedy,
        or the LM-fused device beam when serving with ``kenlm_directory``).
        ``mesh`` defaults to all local devices on one ``'data'`` axis; audio is
        padded to 30 s multiples so programs compile once per length bucket.
        """
        if sequence_parallel or mesh is not None:
            return self._transcribe_long_sequence_parallel(audio, mesh)
        del silence_threshold  # segmentation cuts at the quietest window instead
        texts = [self.transcribe_audio(segment) for segment in
                 split_long_audio(audio, max_segment_s, min_silence_s)]
        return " ".join(text for text in texts if text)

    _SP_BUCKET_SAMPLES = 30 * 16000  # long-form programs compile per 30 s increment

    def _sp_program(self, mesh, bucket: int):
        """One fused SPMD program per (mesh, padded-length bucket): wav (replicated)
        -> mel features -> time-sharded constraint -> halo-exchange conv forward
        (`parallel/sequence.py`) -> decode -> collapsed tokens. Cached like the
        n-best programs."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .features.spectrogram import features_batch
        from .parallel.mesh import DATA_AXIS
        from .parallel.sequence import sequence_parallel_log_probs

        key = (id(mesh), bucket)
        with self._nbest_lock:
            if key in self._sp_programs:
                return self._sp_programs[key]
            config, word_lm, decoder = self.config, self.word_lm, self._decoder

            def sp_fn(params, wav, length):
                features, frame_counts = features_batch(wav[None], length[None])
                features = jax.lax.with_sharding_constraint(
                    features, NamedSharding(mesh, P(None, DATA_AXIS, None)))
                log_probs = sequence_parallel_log_probs(config, params, features,
                                                        mesh)
                logit_lengths = w2l.prediction_lengths(config, frame_counts)
                if word_lm is not None:
                    from .ops.device_beam import beam_search_decode_device

                    # The beam scans frames sequentially: gather the time-sharded
                    # posteriors first (tiny vs the audio — classes * T floats).
                    log_probs = jax.lax.with_sharding_constraint(
                        log_probs, NamedSharding(mesh, P()))
                    tokens, counts = beam_search_decode_device(
                        log_probs, logit_lengths,
                        blank=config.grapheme_set_size - 1,
                        beam_width=decoder["beam_width"], word_lm=word_lm,
                        lm_weight=decoder["lm_weight"],
                        word_count_weight=decoder["word_count_weight"],
                        valid_word_count_weight=decoder["valid_word_count_weight"],
                        prune_classes=decoder["prune_classes"],
                        lexicon_constrained=self.lexicon_constrained,
                        # SP decodes the WHOLE recording in one beam (no 30 s
                        # segmentation): the default 256-grapheme cap would
                        # silently truncate ~2 min of speech. Frame count is the
                        # exact CTC emission bound and is static per bucket.
                        max_decoded_length=log_probs.shape[1])
                else:
                    tokens, counts = greedy_decode(log_probs, logit_lengths,
                                                   config.grapheme_set_size - 1)
                return tokens[0], counts[0]

            program = jax.jit(sp_fn)
            self._sp_programs[key] = program
            return program

    def _transcribe_long_sequence_parallel(self, audio: np.ndarray, mesh=None) -> str:
        jnp = self._jnp
        if mesh is None:
            mesh = self._default_sp_mesh
            if mesh is None:
                from .parallel.mesh import make_mesh
                mesh = self._default_sp_mesh = make_mesh(self._jax.devices())
        length = len(audio)
        bucket = max(self._SP_BUCKET_SAMPLES,
                     -(-length // self._SP_BUCKET_SAMPLES) * self._SP_BUCKET_SAMPLES)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:length] = audio
        tokens, count = self._sp_program(mesh, bucket)(
            self.params, jnp.asarray(padded), jnp.asarray(length, jnp.int32))
        tokens = np.asarray(tokens)[: int(count)]
        return self.codec.decode_graphemes(tokens.tolist(), merge_repeated=False)

    def measure_latency(self, duration_s: float = 4.0, iterations: int = 20
                        ) -> Tuple[float, float]:
        """Returns (p50, p95) seconds for a single-utterance transcription request."""
        audio = (0.1 * np.random.RandomState(0).randn(int(duration_s * 16000))
                 ).astype(np.float32)
        self.transcribe_audio(audio)  # compile
        times = []
        for _ in range(iterations):
            start = time.time()
            self.transcribe_audio(audio)
            times.append(time.time() - start)
        return float(np.percentile(times, 50)), float(np.percentile(times, 95))
