"""Persistent XLA compilation cache setup.

Compiles for the full train step take minutes (remote-compile TPU backends especially);
caching them on disk makes every process after the first start in seconds. Call
``enable_compilation_cache()`` before building jitted functions (idempotent).
"""
import os
from pathlib import Path
from typing import Optional

_DEFAULT_CACHE_DIR = Path(os.environ.get("SPEECHLESS_TPU_COMPILE_CACHE",
                                         str(Path.home() / ".cache" / "speechless-tpu-xla")))


def enable_compilation_cache(cache_dir: Optional[Path] = None) -> None:
    import jax

    try:
        if jax.default_backend() == "cpu":
            # CPU AOT artifacts encode host machine features and can SIGILL when replayed
            # on a different host; the cache only pays off for the slow TPU compiles anyway.
            return
    except Exception:
        return
    directory = Path(cache_dir) if cache_dir is not None else _DEFAULT_CACHE_DIR
    directory.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(directory))
        # Cache everything, however small/fast to compile.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags
