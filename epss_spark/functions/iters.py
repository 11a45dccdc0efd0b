"""Driver-side iterator helpers, API-parity with the reference's only
doctest-covered utilities (reference epss/util.py:342-374). In the Spark
engine these are NOT dataflow operators — pairwise diffs became the W1
window (operators/quantize.py) and chunking became repartition — but users
of the reference call them directly, so they ship with identical semantics.
"""

from __future__ import annotations

from itertools import islice, tee
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")


def iter_pairwise(iterable: Iterable[T]) -> Iterator[tuple[T, T]]:
    """s -> (s0, s1), (s1, s2), (s2, s3), ...
    (reference epss/util.py:342-357)

    >>> list(iter_pairwise([1, 2, 3, 4]))
    [(1, 2), (2, 3), (3, 4)]
    >>> list(iter_pairwise([]))
    []
    """
    a, b = tee(iterable)
    next(b, None)
    return zip(a, b)


def iter_nonblank_lines(path: str) -> Iterator[str]:
    """Stripped, non-blank lines of a text file — the reference's id-list
    reader semantics (reference epss/util.py:377-382, SURVEY §2.4 F6).

    Used by the CLI's --cve-id-file flag; stays a driver helper because a
    watch-list is bounded input, not a dataset.
    """
    with open(path) as f:
        for line in f:
            stripped = line.strip()
            if stripped:
                yield stripped


def iter_chunks(iterable: Iterable[T], chunk_size: int) -> Iterator[list[T]]:
    """Fixed-size chunks, last one ragged (reference epss/util.py:360-374).

    >>> list(iter_chunks(range(5), 2))
    [[0, 1], [2, 3], [4]]
    >>> list(iter_chunks([], 3))
    []
    """
    it = iter(iterable)
    while chunk := list(islice(it, chunk_size)):
        yield chunk
