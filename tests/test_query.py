"""Query predicate compiler tests, incl. the documented divergences from the
reference (SURVEY.md §7 quirk parity decisions)."""

from __future__ import annotations

from epss_spark.plans.query import Query, apply_query, compile_predicate, semi_join_ids


def _scores(spark):
    return spark.createDataFrame(
        [
            ("CVE-2019-165", 0.0, 0.1),
            ("CVE-2019-1653", 0.5, 0.9),
            ("CVE-2019-16530", 0.9, 0.99),
            ("CVE-2020-0001", 0.2, 0.5),
        ],
        "cve string, epss double, percentile double",
    )


def test_zero_bound_is_real(spark):
    """Reference ignores 0.0 bounds via truthiness (epss/client.py:278-288);
    we treat them as real bounds — a 0.0 min filters nothing out but a 0.0
    MAX keeps only zeros."""
    df = _scores(spark)
    assert apply_query(df, Query(min_value=0.0)).count() == 4
    assert apply_query(df, Query(max_value=0.0)).count() == 1


def test_rlike_reference_parity(spark):
    """Unescaped alternation substring matching: 'CVE-2019-165' matches its
    own superstrings too (reference epss/client.py:275-276)."""
    df = _scores(spark)
    got = {r.cve for r in apply_query(df, Query(ids=("CVE-2019-165",))).collect()}
    assert got == {"CVE-2019-165", "CVE-2019-1653", "CVE-2019-16530"}


def test_isin_exact_mode(spark):
    df = _scores(spark)
    got = {r.cve for r in apply_query(df, Query(ids=("CVE-2019-165",), match="isin")).collect()}
    assert got == {"CVE-2019-165"}


def test_empty_query_no_filter(spark):
    assert compile_predicate(Query()) is None
    assert apply_query(_scores(spark), Query()).count() == 4


def test_semi_join_ids(spark):
    df = _scores(spark)
    ids = spark.createDataFrame([("CVE-2019-1653",), ("CVE-2020-0001",)], "cve string")
    got = {r.cve for r in semi_join_ids(df, ids).collect()}
    assert got == {"CVE-2019-1653", "CVE-2020-0001"}


def test_conjunction(spark):
    df = _scores(spark)
    q = Query(min_value=0.1, max_percentile=0.9)
    got = {r.cve for r in apply_query(df, q).collect()}
    assert got == {"CVE-2019-1653", "CVE-2020-0001"}
