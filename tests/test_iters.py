"""Iterator-util parity (reference epss/util.py:342-374, incl. doctests)."""

import doctest

from epss_spark.functions import iters
from epss_spark.functions.iters import iter_chunks, iter_pairwise


def test_doctests():
    results = doctest.testmod(iters)
    assert results.failed == 0 and results.attempted >= 4


def test_pairwise():
    assert list(iter_pairwise("abc")) == [("a", "b"), ("b", "c")]
    assert list(iter_pairwise([1])) == []


def test_chunks():
    assert list(iter_chunks(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(iter_chunks(range(6), 3)) == [[0, 1, 2], [3, 4, 5]]
