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

    def _bind_beam_search(self):
        import numpy as np  # noqa: F401  (ensures numpy is importable before first use)

        lib = self._lib
        if getattr(lib, "_beam_bound", False):
            return
        lib.sl_ctc_beam_search.restype = ctypes.c_int
        lib.sl_ctc_beam_search.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib._beam_bound = True

    def ctc_beam_search(self, log_probs, lengths, blank: int, beam_width: int,
                        lm_handle: int = 0, alphabet=None, space_index: int = -1,
                        lm_weight: float = 0.8, word_count_weight: float = 0.0,
                        valid_word_count_weight: float = 2.3,
                        class_log_prob_floor: float = 0.0, num_threads: int = 0):
        """Batched CTC prefix beam search (beam_search.cpp). Returns (tokens, counts):
        ``tokens (batch, t_max) int32`` -1-padded, ``counts (batch,) int32``.
        ``class_log_prob_floor`` < 0 enables per-frame class pruning (0.0 = exact)."""
        import numpy as np

        self._bind_beam_search()
        log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
        batch, t_max, classes = log_probs.shape
        lengths = np.ascontiguousarray(lengths, dtype=np.int32)
        tokens = np.empty((batch, t_max), dtype=np.int32)
        counts = np.empty(batch, dtype=np.int32)
        if alphabet is not None:
            codepoints = np.array([ord(c) for c in alphabet], dtype=np.uint32)
            alphabet_ptr = codepoints.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        else:
            alphabet_ptr = None
        status = self._lib.sl_ctc_beam_search(
            log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            batch, t_max, classes,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            blank, beam_width, ctypes.c_void_p(lm_handle or None), alphabet_ptr,
            space_index, lm_weight, word_count_weight, valid_word_count_weight,
            class_log_prob_floor, num_threads,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if status != 0:
            raise ValueError("native beam search failed (status {})".format(status))
        return tokens, counts

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
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
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
