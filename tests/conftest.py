"""Test configuration: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4d).

Environment must be set before jax is imported anywhere, hence this happens at conftest
import time (pytest loads conftest before test modules).
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).parent.parent))

# The axon sitecustomize registers the tunneled-TPU backend on interpreter start and pins
# JAX_PLATFORMS=axon; config.update after import is the reliable way to force CPU for tests.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, "expected the 8-device virtual CPU mesh for sharding tests"

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process bootstrap, large corpora)")


def pytest_collection_modifyitems(config, items):
    """``PYTEST_SHUFFLE=<seed>``: randomize test order (across and within modules) to
    prove the suite is order-independent — the XLA:CPU compile-count segfault was
    historically dodged by ordering (see `_bound_in_process_compiles`; the one
    known-fragile compile now runs subprocess-isolated in
    `test_serving_export.test_lm_fused_bundle_roundtrip`)."""
    seed = os.environ.get("PYTEST_SHUFFLE")
    if seed:
        import random

        rand = random.Random(int(seed))
        # Shuffle module order AND order within each module, but keep each module's
        # items contiguous — module-scoped fixtures (compiled transcribers etc.)
        # still build once each, so the shuffled suite stays ~the same runtime.
        by_module = {}
        for item in items:
            by_module.setdefault(item.module.__name__, []).append(item)
        modules = list(by_module.values())
        rand.shuffle(modules)
        for group in modules:
            rand.shuffle(group)
        items[:] = [item for group in modules for item in group]


@pytest.fixture(autouse=True, scope="module")
def _bound_in_process_compiles():
    """XLA:CPU's JIT deterministically segfaults inside backend_compile_and_load after
    a few hundred compiles accumulate in one process (observed 3/3 full-suite runs; any
    single module passes standalone). Clearing JAX's executable caches at every module
    boundary bounds the per-process compile count; the crash point migrates as tests
    are added, so a per-module clear beats point fixes before whichever test currently
    sits past the threshold. Costs a few re-compiles of shared tiny CPU programs per
    module — seconds against the ~20 min suite."""
    jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_test_wav(path: Path, duration_s: float = 1.0, sample_rate: int = 16000,
                  seed: int = 0) -> np.ndarray:
    """Write a deterministic synthetic test wav (tones + noise) and return its samples."""
    rand = np.random.RandomState(seed)
    t = np.arange(int(duration_s * sample_rate)) / sample_rate
    audio = (0.4 * np.sin(2 * np.pi * 440.0 * t)
             + 0.2 * np.sin(2 * np.pi * 1337.0 * t + 0.5)
             + 0.05 * rand.randn(len(t))).astype(np.float32)
    audio = np.clip(audio, -0.99, 0.99)
    from speechless_tpu.features import audio_io
    audio_io.write_wav(path, audio, sample_rate)
    return audio


class FakeSpectrogram:
    """Minimal LabeledSpectrogram stand-in: a fixed feature array + transcript."""

    def __init__(self, spec, label):
        self._spec = spec
        self.label = label

    def z_normalized_transposed_spectrogram(self):
        return self._spec
