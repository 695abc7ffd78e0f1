"""Small, dependency-free helpers shared by every layer.

Covers the utility surface of the reference (`/root/reference/speechless/tools.py:15-112`):
assertion helpers, grouping/pagination, run-name timestamps, and the global "results" logger.
"""
import logging
import sys
from collections import Counter, OrderedDict
from itertools import groupby
from pathlib import Path
from time import strftime
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, TypeVar

E = TypeVar("E")
K = TypeVar("K")
V = TypeVar("V")


def single(sequence: List[E]) -> E:
    """Return the only element of ``sequence``; assert there is exactly one."""
    assert len(sequence) == 1, "expected exactly one element, got {}".format(len(sequence))
    return sequence[0]


def single_or_none(sequence: List[E]) -> Optional[E]:
    assert len(sequence) <= 1, "expected at most one element, got {}".format(len(sequence))
    return next(iter(sequence), None)


def read_text(path: Path, encoding: Optional[str] = None) -> str:
    with Path(path).open(encoding=encoding) as f:
        return f.read()


def write_text(path: Path, text: str, encoding: Optional[str] = None) -> None:
    with Path(path).open(mode="w", encoding=encoding) as f:
        f.write(text)


def mkdir(directory: Path) -> None:
    Path(directory).mkdir(parents=True, exist_ok=True)


def home_directory() -> Path:
    return Path.home()


def name_without_extension(file: Path) -> str:
    return Path(file).stem


def extension(file: Path) -> str:
    return Path(file).suffix


def distinct(sequence: Iterable[E]) -> List[E]:
    return list(dict.fromkeys(sequence))  # insertion-ordered since py3.7


def count_summary(sequence: Iterable[E]) -> str:
    return ", ".join("{}: {}".format(tag, count) for tag, count in Counter(sequence).most_common())


def group(iterable: Iterable[E], key: Callable[[E], K],
          value: Callable[[E], V] = lambda x: x) -> Dict[K, Tuple[V, ...]]:
    """Group ``iterable`` by ``key`` into an insertion-ordered dict of tuples (sorted by key)."""
    return OrderedDict((k, tuple(map(value, values)))
                       for k, values in groupby(sorted(iterable, key=key), key))


def timestamp() -> str:
    return strftime("%Y%m%d-%H%M%S")


def duplicates(sequence: Iterable[E]) -> List[E]:
    counts = Counter(sequence)
    return [item for item, count in counts.items() if count > 1]


def average_or_nan(numbers: List[float]) -> float:
    return sum(numbers) / len(numbers) if numbers else float("nan")


def paginate(sequence: List[E], page_size: int) -> Iterable[List[E]]:
    return (sequence[start:start + page_size]
            for start in range(0, len(sequence), page_size))


logger = logging.getLogger("results")
logger.setLevel(logging.INFO)
if not logger.handlers:
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setLevel(logging.INFO)
    logger.addHandler(_handler)


def log(obj: Any) -> None:
    logger.info(str(obj))
