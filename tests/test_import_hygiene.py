"""Importing the package must never initialize the JAX backend.

Spawn-pool cache-fill workers import these modules (CLAUDE.md invariant), and host-only
use (C++ beam eval, corpus tooling) must survive an unreachable TPU backend. Regression
for module-scope `jnp.uint32(...)` constants in ops/decode_jax.py, which made
`import speechless_tpu.system` crash outright while the axon tunnel was down.
"""
import subprocess
import sys

_PROBE = """
import jax
jax.config.update("jax_platforms", "nonexistent_backend")

import speechless_tpu.system
import speechless_tpu.ops
import speechless_tpu.serving
import speechless_tpu.configuration

# Sanity: the guard platform really would fail on first device use, so the imports
# above genuinely ran backend-free.
import jax.numpy as jnp
try:
    jnp.zeros(1)
except RuntimeError:
    print("IMPORT-HYGIENE-OK")
else:
    print("GUARD-INEFFECTIVE")
"""


def test_package_import_does_not_touch_backend():
    result = subprocess.run([sys.executable, "-c", _PROBE], capture_output=True,
                            text=True, timeout=240, cwd="/root/repo")
    assert "IMPORT-HYGIENE-OK" in result.stdout, (result.stdout, result.stderr[-2000:])
