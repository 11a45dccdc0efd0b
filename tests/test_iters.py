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


def test_iter_nonblank_lines(tmp_path):
    from epss_spark.functions.iters import iter_nonblank_lines

    p = tmp_path / "ids.txt"
    p.write_text("CVE-2021-1\n\n  CVE-2021-2  \n\t\nCVE-2021-3")
    assert list(iter_nonblank_lines(str(p))) == ["CVE-2021-1", "CVE-2021-2", "CVE-2021-3"]
