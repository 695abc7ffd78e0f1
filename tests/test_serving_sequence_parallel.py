"""Sequence-parallel long-form serving (`Transcriber.transcribe_long_audio(
sequence_parallel=True)`): one SPMD dispatch transcribes the whole recording with
the time axis sharded over the mesh — facade-level parity with the single-device
program and with the silence-segmentation default."""
import numpy as np
import pytest

from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.parallel import mesh as pmesh
from speechless_tpu.parallel.sequence import halo_output_frames
from speechless_tpu.serving import Transcriber

from test_streaming import ALPHABET, _tiny_config


@pytest.fixture(scope="module")
def transcriber():
    import jax

    config = _tiny_config()
    params = w2l.init_params(config, jax.random.PRNGKey(9))
    t = Transcriber(config, params, ALPHABET, sample_buckets=(131072,))
    # CPU-sized compile bucket (the production default is 30 s); 1024 mel frames
    # keeps every 8-device shard's chunk >= the conv halo so the dispatch is
    # genuinely sharded rather than falling back to the unsharded forward.
    t._SP_BUCKET_SAMPLES = 131072
    return t


def _audio(samples, seed):
    return (np.random.RandomState(seed).randn(samples) * 0.3).astype(np.float32)


def test_sequence_parallel_matches_single_device(transcriber):
    """The 8-way time-sharded dispatch must transcribe byte-identically to the
    same program on a 1-device mesh (where `sequence_parallel_logits` degenerates
    to the plain forward) — the halo exchange and edge-roll logic change nothing."""
    import jax

    audio = _audio(120000, seed=60)
    mesh8 = pmesh.make_mesh(jax.devices()[:8])
    mesh1 = pmesh.make_mesh(jax.devices()[:1])
    # Genuinely sharded: every shard's chunk exceeds the halo.
    config = transcriber.config
    frames = transcriber._SP_BUCKET_SAMPLES // 128
    ratio = config.input_to_prediction_length_ratio
    n = mesh8.shape[pmesh.DATA_AXIS]
    chunk = -(-frames // (n * ratio)) * ratio
    assert chunk >= halo_output_frames(config) * ratio

    sharded = transcriber.transcribe_long_audio(audio, mesh=mesh8)
    single = transcriber.transcribe_long_audio(audio, mesh=mesh1)
    assert sharded == single
    assert sharded  # non-degenerate: random audio decodes to something


def test_sequence_parallel_matches_offline_transcribe(transcriber):
    """At a matched padded length (the transcriber's sample bucket == the SP
    bucket), the SP transcript equals the offline single-utterance program's —
    same features, same forward, same greedy decode, one mesh dispatch."""
    import jax

    audio = _audio(100000, seed=61)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    assert transcriber._bucket(len(audio)) == transcriber._SP_BUCKET_SAMPLES
    sp = transcriber.transcribe_long_audio(audio, sequence_parallel=True, mesh=mesh)
    offline = transcriber.transcribe_audio(audio)
    assert sp == offline


def test_sequence_parallel_program_is_cached(transcriber):
    """Same mesh + same padded bucket reuse one compiled program (the cache the
    30 s production buckets rely on)."""
    import jax

    mesh = pmesh.make_mesh(jax.devices()[:8])
    transcriber.transcribe_long_audio(_audio(90000, seed=62), mesh=mesh)
    programs = len(transcriber._sp_programs)
    transcriber.transcribe_long_audio(_audio(110000, seed=63), mesh=mesh)
    assert len(transcriber._sp_programs) == programs
