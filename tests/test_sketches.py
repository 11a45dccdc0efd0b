"""HyperLogLog sketch tests (operators/sketches.py): accuracy against
exact distinct counts, the exact-merge law, and the linear-counting
small-range branch. Cross-engine value parity is covered by the
agg_hll_distinct DuckDB oracle (pytest tier / driver surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epss_spark.operators import sketches

SF = "/root/testdata/sf0.001"


def test_estimate_within_hll_error_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.c
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("c"))
        .collect()
    }
    est = {
        r.l_returnflag: r.hll_distinct
        for r in sketches.hll_distinct(li, ["l_returnflag"], "l_orderkey", b=9).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        rel = abs(e - exact[k]) / exact[k]
        # 1.04/sqrt(512) ~ 4.6% std error; 3 sigma ~ 14%
        assert rel < 0.14, (k, e, exact[k], rel)


def test_merge_equals_sketch_of_union_exactly(spark):
    """The merge law is EXACT on register tables (not approximate):
    max-merge of two partition sketches must equal the sketch of the
    union, register for register — and therefore estimate for
    estimate. This is what makes persisted sketches incrementally
    updatable without touching history."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    sa = sketches.hll_registers(a, ["l_returnflag"], "l_orderkey")
    sb = sketches.hll_registers(b, ["l_returnflag"], "l_orderkey")
    merged = sketches.hll_merge(sa, sb, group_cols=["l_returnflag"])
    full = sketches.hll_registers(li, ["l_returnflag"], "l_orderkey")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    me = sorted(map(tuple, sketches.hll_estimate(merged, ["l_returnflag"]).collect()))
    fe = sorted(map(tuple, sketches.hll_estimate(full, ["l_returnflag"]).collect()))
    assert me == fe


def test_linear_counting_branch_is_tight_at_low_cardinality(spark):
    # 40 distinct values in 512 registers -> linear counting, which is
    # near-exact at this fill factor
    df = spark.range(4000).select((F.col("id") % 40).alias("v"), F.lit("g").alias("grp"))
    est = sketches.hll_distinct(df, ["grp"], "v", b=9).collect()[0].hll_distinct
    assert abs(est - 40) / 40 < 0.05, est


def test_nulls_are_ignored_and_b_validated(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", "a"), ("g", "b"), ("g", "a")], "grp string, v string"
    )
    est = sketches.hll_distinct(df, ["grp"], "v", b=9).collect()[0].hll_distinct
    assert abs(est - 2) < 0.5
    with pytest.raises(ValueError, match="b="):
        sketches.hll_registers(df, ["grp"], "v", b=2)


class TestBloom:
    def test_no_false_negatives_vs_exact_contamination(self, spark):
        """bloom_frac must DOMINATE the exact contamination fraction for
        every document (a Bloom filter cannot miss a true member), and
        at m=2^14 over the testdata benchmark set it should rarely
        exceed it (fill is low, FP rate ~ fill^3)."""
        from epss_spark.operators import dedup, sketches

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        bench = docs.filter(F.col("doc_id") < 10)
        rest = docs.filter(F.col("doc_id") >= 10)
        exact = {
            r.doc_id: r.contamination_frac
            for r in dedup.benchmark_contamination(rest, bench).collect()
        }
        bloom = {
            r.doc_id: r.bloom_frac
            for r in sketches.bloom_contamination(rest, bench).collect()
        }
        assert set(bloom) == set(exact)
        fp_excess = 0
        for did, bf in bloom.items():
            # bloom_frac is rounded to 6 dp; allow the rounding quantum
            assert bf >= exact[did] - 5.1e-7, (did, bf, exact[did])
            fp_excess += bf - exact[did]
        # aggregate false-positive mass stays small at this fill factor
        assert fp_excess / len(bloom) < 0.02, fp_excess / len(bloom)

    def test_benchmark_docs_self_report_full_contamination(self, spark):
        from epss_spark.operators import sketches

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        bench = docs.filter(F.col("doc_id") < 10)
        self_frac = {
            r.doc_id: r.bloom_frac
            for r in sketches.bloom_contamination(bench, bench).collect()
        }
        assert all(v == 1.0 for v in self_frac.values()), self_frac

    def test_build_validates_m(self, spark):
        from epss_spark.operators import sketches

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="multiple of 64"):
            sketches.bloom_build(df, "v", m=100)


class TestCountMin:
    def test_estimates_dominate_exact_counts_tightly(self, spark):
        from epss_spark.operators import sketches
        from epss_spark.operators.text import tokens

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        tok = docs.select(F.explode(tokens("text")).alias("tok"))
        exact = {r.tok: r.c for r in tok.groupBy("tok").agg(F.count("*").alias("c")).collect()}
        sketch = sketches.cms_build(tok, "tok", d=4, w=1024)
        cands = spark.createDataFrame([(t,) for t in list(exact)[:50]], "tok string")
        est = {
            r.tok: r.cms_count
            for r in sketches.cms_estimate(sketch, cands, "tok", d=4, w=1024).collect()
        }
        n_stream = sum(exact.values())
        for t, e in est.items():
            assert e >= exact[t], (t, e, exact[t])  # never undercounts
            # CM guarantee: excess <= e/w * N with prob 1-e^-d; allow 2x slack
            assert e - exact[t] <= 2 * 2.72 * n_stream / 1024, (t, e, exact[t])

    def test_merge_equals_sketch_of_union_exactly(self, spark):
        from epss_spark.operators import sketches
        from epss_spark.operators.text import tokens

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        a = tok.filter(F.col("doc_id") % 2 == 0).select("tok")
        b = tok.filter(F.col("doc_id") % 2 == 1).select("tok")
        merged = sketches.cms_merge(
            sketches.cms_build(a, "tok"), sketches.cms_build(b, "tok")
        )
        full = sketches.cms_build(tok.select("tok"), "tok")
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    def test_unknown_value_estimates_near_zero(self, spark):
        from epss_spark.operators import sketches

        vals = spark.range(10000).select((F.col("id") % 500).cast("string").alias("v"))
        sketch = sketches.cms_build(vals, "v", d=4, w=2048)
        cand = spark.createDataFrame([("never-seen-token",)], "v string")
        est = sketches.cms_estimate(sketch, cand, "v", d=4, w=2048).collect()[0].cms_count
        # collisions only: expected ~ N/w per row, min over 4 rows smaller
        assert est <= 3 * 10000 / 2048, est


def test_qdigest_laws(spark):
    """q-digest invariants: (1) the sketch preserves total count; (2) an
    uncompressed digest (huge k) answers EXACT quantiles; (3) compressed
    answers are conservative (rank(answer) >= target rank) and within
    the levels*N/k rank-error bound; (4) out-of-domain values raise."""
    import math
    import random

    from epss_spark.operators import sketches as sk

    random.seed(11)
    vals = [random.randint(0, 255) for _ in range(3000)] + [7] * 500 + [200] * 300
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    levels, k = 8, 16
    dig = sk.qdigest_build(df, "x", levels=levels, k=k)
    nodes = dig.collect()
    n = sum(r.cnt for r in nodes)
    assert n == len(vals)
    t = max(1, n // k)
    # every non-leaf node respects the count bound (leaves may exceed it)
    assert all(r.cnt <= t for r in nodes if r.node_id < (1 << levels))

    qs = [0.25, 0.5, 0.75, 0.9]
    sv = sorted(vals)
    exact_dig = sk.qdigest_build(df, "x", levels=levels, k=10**9)
    got_exact = {r.q: r.value for r in sk.qdigest_quantiles(exact_dig, qs, levels).collect()}
    assert got_exact == {q: sv[math.ceil(q * n) - 1] for q in qs}

    got = {r.q: r.value for r in sk.qdigest_quantiles(dig, qs, levels).collect()}
    for q in qs:
        target = math.ceil(q * n)
        rank_of_answer = sum(1 for x in vals if x <= got[q])
        assert rank_of_answer >= target
        assert rank_of_answer - target <= levels * n // k + 1

    with pytest.raises(ValueError):
        sk.qdigest_build(
            spark.createDataFrame([(300,)], "x long"), "x", levels=8, k=16
        )


def test_qdigest_merge_law(spark):
    """Merging per-partition digests answers within the error bound of a
    digest built over the union — the daily-sketch-table contract."""
    import math
    import random

    from epss_spark.operators import sketches as sk

    random.seed(5)
    a = [random.randint(0, 255) for _ in range(1500)]
    b = [random.randint(0, 100) for _ in range(1500)]  # skewed second day
    levels, k = 8, 16
    da = sk.qdigest_build(spark.createDataFrame([(v,) for v in a], "x long"), "x", levels, k)
    db = sk.qdigest_build(spark.createDataFrame([(v,) for v in b], "x long"), "x", levels, k)
    merged = sk.qdigest_merge(da, db, levels=levels, k=k)
    n = len(a) + len(b)
    assert sum(r.cnt for r in merged.collect()) == n
    got = {r.q: r.value for r in sk.qdigest_quantiles(merged, [0.5, 0.9], levels).collect()}
    allv = a + b
    for q in (0.5, 0.9):
        target = math.ceil(q * n)
        rank_of_answer = sum(1 for x in allv if x <= got[q])
        # each constituent digest contributes up to levels*N_i/k rank
        # slack, and the recompression another levels*N/k
        assert rank_of_answer >= target
        assert rank_of_answer - target <= 2 * levels * n // k + 2


def test_qdigest_empty_and_single_value(spark):
    from epss_spark.operators import sketches as sk

    empty = spark.createDataFrame([], "x long")
    dig = sk.qdigest_build(empty, "x", levels=8, k=16)
    assert dig.count() == 0
    got = sk.qdigest_quantiles(dig, [0.5], levels=8).collect()
    assert got[0].q == 0.5 and got[0].value is None  # no data -> no answer
    one = sk.qdigest_build(
        spark.createDataFrame([(42,)] * 5, "x long"), "x", levels=8, k=16
    )
    got = {r.q: r.value for r in sk.qdigest_quantiles(one, [0.1, 1.0], levels=8).collect()}
    assert got == {0.1: 42, 1.0: 42}


def test_qdigest_compress_paths_identical(spark):
    """r15 dual-path pin: the bounded driver-side compression replay
    (levels <= 16) produces exactly the node set of the distributed
    join-per-depth loop on the same input."""
    import random

    from epss_spark.operators import sketches as sk

    random.seed(23)
    vals = [random.randint(0, 255) for _ in range(2000)] + [3] * 400
    leaves = (
        spark.createDataFrame([(v,) for v in vals], "x long")
        .groupBy("x")
        .count()
        .selectExpr("cast(256 + x as bigint) as node_id", "cast(count as bigint) as cnt")
    )
    t = max(1, len(vals) // 16)
    local = {
        (r.node_id, r.cnt) for r in sk._qdigest_compress(leaves, t, 8).collect()
    }
    # force the distributed loop by calling with levels spelled past the
    # local gate via the module seam: replay with the pre-r15 body
    # (levels > 16 path) on a 8-level domain is not expressible, so pin
    # against the distributed rounds directly
    dist_nodes = leaves
    for depth in range(8, 0, -1):
        from pyspark.sql import functions as F

        lo, hi = 1 << depth, 1 << (depth + 1)
        children = dist_nodes.filter((F.col("node_id") >= lo) & (F.col("node_id") < hi))
        parents = dist_nodes.filter(
            (F.col("node_id") >= lo // 2) & (F.col("node_id") < hi // 2)
        )
        others = dist_nodes.filter((F.col("node_id") >= hi) | (F.col("node_id") < lo // 2))
        fam = (
            children.groupBy((F.col("node_id") / 2).cast("long").alias("pid"))
            .agg(F.sum("cnt").alias("csum"))
            .join(parents.withColumnRenamed("node_id", "pid"), "pid", "full_outer")
            .select(
                "pid",
                (F.coalesce("csum", F.lit(0)) + F.coalesce("cnt", F.lit(0))).alias("total"),
                F.col("cnt").alias("pcnt"),
            )
        )
        kept_children = children.join(
            fam.filter(F.col("total") > t).select(F.col("pid").alias("__p")),
            (F.col("node_id") / 2).cast("long") == F.col("__p"),
            "left_semi",
        )
        merged = fam.filter(F.col("total") <= t).select(
            F.col("pid").alias("node_id"), F.col("total").alias("cnt")
        )
        kept_parents = fam.filter(
            (F.col("total") > t) & F.col("pcnt").isNotNull()
        ).select(F.col("pid").alias("node_id"), F.col("pcnt").alias("cnt"))
        dist_nodes = (
            others.unionByName(kept_children)
            .unionByName(merged)
            .unionByName(kept_parents)
            .localCheckpoint(eager=True)
        )
    dist = {(r.node_id, r.cnt) for r in dist_nodes.collect()}
    assert local == dist
