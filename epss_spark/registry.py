"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair. The correctness harness runs the Spark plan and
the DuckDB oracle side-by-side at sf0.01 and compares row-count + schema +
order-insensitive value hash; column names are aliased identically on both
sides, and float aggregates go through exact DECIMAL(18,2) arithmetic (the
testdata's monetary columns are 2-dp exact) so the comparison is bit-exact,
not tolerance-based.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(name: str, sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB-runnable ANSI-SQL oracle. Queries without an oracle get
    the driver's weaker rows-only check (reserved for genuinely
    non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    import epss_spark.queries_core  # noqa: F401
    import epss_spark.queries_domain  # noqa: F401
    import epss_spark.queries_ext  # noqa: F401

    _LOADED = True


def get_queries():
    load_all()
    return dict(QUERIES)


def get_oracles():
    load_all()
    return dict(ORACLES)
