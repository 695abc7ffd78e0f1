"""Word n-gram language model with Katz back-off, loaded from ARPA files.

Replaces the reference's KenLM dependency (the forked-TF beam decoder,
`/root/reference/speechless/net.py:444-451`): scores words for beam-search shallow fusion
through the `LanguageModelScorer` interface, with the reference's decoder weights applied in
``ops/decode.py``. A native C++ scorer (``speechless_tpu/native/ngram_lm.cpp``) accelerates
scoring for large models; this module is the loader + fallback and the vocabulary surface
(the ``vocabulary`` file check of `net.py:171-177` lives in the system facade).
"""
import gzip
import math
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from ..ops.decode import LanguageModelScorer
from ..utils.tools import log

UNK = "<unk>"
BOS = "<s>"
EOS = "</s>"


class ArpaLanguageModel(LanguageModelScorer):
    """Back-off n-gram LM. Probabilities are log10, matching ARPA/KenLM convention."""

    def __init__(self, order: int,
                 log_probs: List[Dict[Tuple[str, ...], float]],
                 backoffs: List[Dict[Tuple[str, ...], float]]):
        self.order = order
        self._log_probs = log_probs      # index n-1: n-gram -> log10 p
        self._backoffs = backoffs        # index n-1: n-gram -> log10 backoff weight
        self.vocabulary = set(w for (w,) in log_probs[0].keys()) - {BOS, EOS, UNK}

    # -- ARPA parsing -----------------------------------------------------

    @staticmethod
    def load(path: Path) -> "ArpaLanguageModel":
        path = Path(path)
        opener = gzip.open if path.suffix == ".gz" else open
        log_probs: List[Dict[Tuple[str, ...], float]] = []
        backoffs: List[Dict[Tuple[str, ...], float]] = []
        current_order = 0
        with opener(str(path), "rt", encoding="utf8") as f:
            section = None
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line == "\\data\\":
                    section = "data"
                    continue
                if line.endswith("-grams:") and line.startswith("\\"):
                    current_order = int(line[1:line.index("-")])
                    while len(log_probs) < current_order:
                        log_probs.append({})
                        backoffs.append({})
                    section = "ngrams"
                    continue
                if line == "\\end\\":
                    break
                if section == "ngrams":
                    parts = line.split("\t")
                    if len(parts) < 2:
                        parts = line.split()
                        if len(parts) < current_order + 1:
                            continue
                        prob, words, backoff = parts[0], parts[1:current_order + 1], \
                            parts[current_order + 1:]
                    else:
                        prob = parts[0]
                        words = tuple(parts[1].split())
                        backoff = parts[2:]
                    ngram = tuple(words)
                    log_probs[current_order - 1][ngram] = float(prob)
                    if backoff:
                        backoffs[current_order - 1][ngram] = float(backoff[0])
        if not log_probs:
            raise ValueError("No n-grams found in ARPA file {}".format(path))
        return ArpaLanguageModel(order=len(log_probs), log_probs=log_probs, backoffs=backoffs)

    # -- scoring ----------------------------------------------------------

    def _score(self, ngram: Tuple[str, ...]) -> float:
        """log10 p(last word | preceding words) with Katz back-off."""
        order = len(ngram)
        table = self._log_probs[order - 1] if order <= self.order else None
        if table is not None and ngram in table:
            return table[ngram]
        if order == 1:
            unk = self._log_probs[0].get((UNK,))
            return unk if unk is not None else -99.0
        context = ngram[:-1]
        backoff = 0.0
        if len(context) <= self.order:
            backoff = self._backoffs[len(context) - 1].get(context, 0.0)
        return backoff + self._score(ngram[1:])

    def _normalize_word(self, word: str) -> str:
        """KenLM semantics (matched by the native scorer): OOV tokens score as <unk>."""
        return word if (word,) in self._log_probs[0] else UNK

    def score_word(self, context: Sequence[str], word: str) -> float:
        # Only the last order-1 context words matter; normalizing OOV context to <unk>
        # keeps Python and native scorers identical.
        context = tuple(self._normalize_word(w) for w in context[-(self.order - 1):]) \
            if self.order > 1 else ()
        sentence_context = (BOS,) + context
        ngram = (sentence_context + (self._normalize_word(word),))[-(self.order):]
        return self._score(ngram)

    def score_sentence(self, words: Sequence[str], include_eos: bool = True) -> float:
        total = 0.0
        for i, word in enumerate(words):
            total += self.score_word(words[:i], word)
        if include_eos:
            sentence = (BOS,) + tuple(words) + (EOS,)
            total += self._score(sentence[-(self.order):])
        return total

    def is_valid_word(self, word: str) -> bool:
        return word in self.vocabulary


class NativeArpaLanguageModel(LanguageModelScorer):
    """C++-backed ARPA scorer (``speechless_tpu/native/ngram_lm.cpp``) with the same
    interface as `ArpaLanguageModel`; preferred for large models (fast load, compact)."""

    def __init__(self, path: Path):
        from ..native import _native

        if _native is None:
            raise RuntimeError("native extension unavailable")
        self._native = _native
        self._handle = _native.ngram_load(str(path))
        self.order = _native.ngram_order(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._native.ngram_free(self._handle)
            self._handle = None

    def score_word(self, context: Sequence[str], word: str) -> float:
        # Only the trailing order-1 words can affect the score; slicing keeps beam-search
        # fusion O(order) per candidate instead of O(transcript length).
        relevant = context[-(self.order - 1):] if self.order > 1 else []
        return self._native.ngram_score_word(self._handle, " ".join(relevant), word)

    def is_valid_word(self, word: str) -> bool:
        return self._native.ngram_is_valid_word(self._handle, word)

    def score_sentence(self, words: Sequence[str], include_eos: bool = True) -> float:
        total = 0.0
        for i, word in enumerate(words):
            total += self.score_word(words[:i], word)
        if include_eos:
            total += self.score_word(words, EOS)
        return total


def load_language_model(directory_or_file: Path,
                        prefer_native: bool = True) -> Optional[LanguageModelScorer]:
    """Find and load an ARPA LM: accepts a file path or a KenLM-style directory containing
    ``lm.arpa`` / ``*.arpa`` / ``*.arpa.gz``. Uses the C++ scorer when available (Python
    fallback, and always Python for gzip files)."""
    path = Path(directory_or_file)
    candidate: Optional[Path] = None
    if path.is_file():
        candidate = path
    elif path.is_dir():
        candidates = (sorted(path.glob("lm.arpa")) + sorted(path.glob("*.arpa")) +
                      sorted(path.glob("*.arpa.gz")))
        if candidates:
            candidate = candidates[0]
        else:
            log("No ARPA language model found in {}; beam search runs without LM fusion."
                .format(path))
    if candidate is None:
        return None
    if prefer_native and candidate.suffix != ".gz":
        try:
            return NativeArpaLanguageModel(candidate)
        except Exception as e:
            log("Native n-gram scorer unavailable ({}); using Python scorer.".format(e))
    return ArpaLanguageModel.load(candidate)
