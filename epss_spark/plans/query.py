"""The reference's query language: a frozen dataclass of predicate
parameters (reference: epss/client.py:21-27), AND-composed when bound
(reference: epss/client.py:270-290). Here it compiles to a single Catalyst
Column conjunction, so pruning/pushdown happen for free.

Two deliberate divergences from the reference, both pinned by tests:

1. Zero-bound truthiness. The reference tests bounds with `if query.min_epss:`
   (epss/client.py:278,284) so a bound of 0.0 is silently ignored. We test
   `is not None` — a 0.0 bound filters. (test_query.py::test_zero_bound)

2. ID matching. The reference matches CVE watch-lists by joining ids into an
   unescaped regex alternation (epss/client.py:275-276): `CVE-2019-165`
   matches `CVE-2019-1653` AND `CVE-2019-16530`. We ship BOTH modes:
   `match="rlike"` reproduces the reference bug-for-bug (default, for
   parity); `match="isin"` is exact equality — at scale, prefer
   `semi_join_ids` which broadcasts the id list instead of compiling a
   mega-regex.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    """Predicate parameters (reference: epss/client.py:21-27)."""

    ids: tuple[str, ...] | None = None
    min_value: float | None = None
    max_value: float | None = None
    min_percentile: float | None = None
    max_percentile: float | None = None
    min_time: object | None = None
    max_time: object | None = None
    match: str = "rlike"  # "rlike" (reference parity) | "isin" (exact)

    # column bindings — defaults are the EPSS fact-table names
    id_col: str = "cve"
    value_col: str = "epss"
    percentile_col: str = "percentile"
    time_col: str = "date"


def compile_predicate(q: Query) -> Column | None:
    """Compile a Query to one Column conjunction (or None = no filter)."""
    preds: list[Column] = []
    if q.min_time is not None:
        preds.append(F.col(q.time_col) >= F.lit(q.min_time))
    if q.max_time is not None:
        preds.append(F.col(q.time_col) <= F.lit(q.max_time))
    if q.ids:
        if q.match == "rlike":
            # reference parity: unescaped alternation, substring semantics
            # (epss/client.py:275-276)
            preds.append(F.col(q.id_col).rlike("|".join(q.ids)))
        elif q.match == "isin":
            preds.append(F.col(q.id_col).isin(list(q.ids)))
        else:
            raise ValueError(f"unknown match mode {q.match!r}")
    if q.min_value is not None:
        preds.append(F.col(q.value_col) >= F.lit(float(q.min_value)))
    if q.max_value is not None:
        preds.append(F.col(q.value_col) <= F.lit(float(q.max_value)))
    if q.min_percentile is not None:
        preds.append(F.col(q.percentile_col) >= F.lit(float(q.min_percentile)))
    if q.max_percentile is not None:
        preds.append(F.col(q.percentile_col) <= F.lit(float(q.max_percentile)))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def apply_query(df: DataFrame, q: Query) -> DataFrame:
    pred = compile_predicate(q)
    return df.filter(pred) if pred is not None else df


def semi_join_ids(df: DataFrame, ids_df: DataFrame, id_col: str = "cve") -> DataFrame:
    """Watch-list filtering at scale: broadcast left-semi join instead of a
    compiled alternation regex (which is O(ids) per row and un-pushable)."""
    return df.join(F.broadcast(ids_df.select(id_col).distinct()), id_col, "left_semi")
