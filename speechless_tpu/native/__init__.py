"""Native (C++) host-side routines, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package holds the genuinely host-side native
code (edit distance for eval, the KenLM-style n-gram scorer for beam decoding), matching the
reference's use of native deps `editdistance` and the KenLM TF fork (SURVEY.md §2b).

The shared library is compiled on demand with g++ (cached next to the sources). If compilation
fails (no toolchain), callers fall back to pure-Python implementations.
"""
import ctypes
import subprocess
from pathlib import Path

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "_speechless_native.so"
_SOURCES = sorted(_HERE.glob("*.cpp"))


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.sl_levenshtein.restype = ctypes.c_int64
        lib.sl_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ]
        lib.sl_decode_flac.restype = ctypes.c_int
        lib.sl_decode_flac.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sl_free_buffer.restype = None
        lib.sl_free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]

    def levenshtein(self, a: str, b: str) -> int:
        a_buf = a.encode("utf-32-le")
        b_buf = b.encode("utf-32-le")
        a_arr = (ctypes.c_uint32 * len(a)).from_buffer_copy(a_buf) if a else (ctypes.c_uint32 * 1)()
        b_arr = (ctypes.c_uint32 * len(b)).from_buffer_copy(b_buf) if b else (ctypes.c_uint32 * 1)()
        return int(self._lib.sl_levenshtein(a_arr, len(a), b_arr, len(b)))

    def _bind_ngram(self):
        lib = self._lib
        lib.sl_ngram_load.restype = ctypes.c_void_p
        lib.sl_ngram_load.argtypes = [ctypes.c_char_p]
        lib.sl_ngram_free.restype = None
        lib.sl_ngram_free.argtypes = [ctypes.c_void_p]
        lib.sl_ngram_order.restype = ctypes.c_int
        lib.sl_ngram_order.argtypes = [ctypes.c_void_p]
        lib.sl_ngram_score_word.restype = ctypes.c_float
        lib.sl_ngram_score_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                            ctypes.c_char_p]
        lib.sl_ngram_is_valid_word.restype = ctypes.c_int
        lib.sl_ngram_is_valid_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p]

    def ngram_load(self, path: str) -> int:
        self._bind_ngram()
        handle = self._lib.sl_ngram_load(path.encode())
        if not handle:
            raise ValueError("Failed to load ARPA language model from {}".format(path))
        return handle

    def ngram_free(self, handle: int) -> None:
        self._lib.sl_ngram_free(handle)

    def ngram_order(self, handle: int) -> int:
        return int(self._lib.sl_ngram_order(handle))

    def ngram_score_word(self, handle: int, context: str, word: str) -> float:
        return float(self._lib.sl_ngram_score_word(handle, context.encode(), word.encode()))

    def ngram_is_valid_word(self, handle: int, word: str) -> bool:
        return bool(self._lib.sl_ngram_is_valid_word(handle, word.encode()))

    def decode_flac(self, path: str):
        """Decode a FLAC file to (mono float32 numpy array, sample_rate)."""
        import numpy as np

        samples = ctypes.POINTER(ctypes.c_float)()
        count = ctypes.c_int64()
        sample_rate = ctypes.c_int32()
        status = self._lib.sl_decode_flac(path.encode(), ctypes.byref(samples),
                                          ctypes.byref(count), ctypes.byref(sample_rate))
        if status != 0:
            raise ValueError("FLAC decode failed for {} (error {})".format(path, status))
        try:
            audio = np.ctypeslib.as_array(samples, shape=(count.value,)).copy()
        finally:
            self._lib.sl_free_buffer(samples)
        return audio, int(sample_rate.value)


def _needs_rebuild() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(src.stat().st_mtime > lib_mtime for src in _SOURCES)


def build(force: bool = False) -> Path:
    """Compile the shared library with g++ (O3, fPIC). Idempotent unless sources changed."""
    if force or _needs_rebuild():
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
               "-o", str(_LIB_PATH)] + [str(s) for s in _SOURCES]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    try:
        build()
        return _Native(ctypes.CDLL(str(_LIB_PATH)))
    except Exception:
        return None


_native = _load()
