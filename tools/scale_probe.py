"""One-order-of-magnitude scale probe (PERF.md round-7): run a headline
subset against a workload 10x the bench's scaled tables (i.e. ~sf1
equivalents: 128M-row events, 96M-row lineitem, 200k salted docs) and
compare each query's time against its linear extrapolation from the
bench-scale run. A formulation that survives 100x only as a plan (but
melts in practice — window spill, quadratic pair growth, driver
collect) shows up here as super-linear time.

Usage: python tools/scale_probe.py [mult] [query ...]
Prints one JSON line {query: {bench_sec, probe_sec, ratio_vs_linear}}.
Builds its scaled tables once under .scratch/ (keyed like the bench
workload); first build at 10x takes several minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from epss_spark import registry
from epss_spark.session import get_spark, sf_dir

# the subset spans the engine's plan families: window kernel, hash agg,
# star join, line-dedup aggregate, zero-shuffle retrieval, span dedup
DEFAULT_QUERIES = [
    "window_lag_diff",
    "agg_groupby",
    "join_multi",
    "dedup_lines",
    "search_bm25",
    "dedup_spans",
]

# `full` = the entire bench headline (round-8: every headline query gets
# 10x evidence) plus the bm25 build/query split pseudo-queries below.
PSEUDO = ("bm25_build", "bm25_lookup")


def _bm25_split(spark, d: str, which: str):
    """search_bm25_indexed's headline number fuses index BUILD + query
    (the oracle must replay the build). The scale probe separates them:
    bm25_build = tokenize + postings/doc_stats aggregates + parquet
    write; bm25_lookup = the artifact-backed query alone (no corpus
    tokenize in the plan, term-pruned)."""
    from pyspark.sql import functions as F

    from epss_spark.operators import retrieval
    from epss_spark.tables import load_table

    out = os.path.join(".scratch", f"probe_bm25_{abs(hash(d)) % 10**8}")
    if which == "bm25_build":
        docs = load_table(spark, d, "documents")
        postings, doc_stats = retrieval.bm25_index(docs)
        postings.write.mode("overwrite").parquet(os.path.join(out, "postings"))
        doc_stats.write.mode("overwrite").parquet(os.path.join(out, "doc_stats"))
        return spark.read.parquet(os.path.join(out, "doc_stats")).limit(1)
    postings = spark.read.parquet(os.path.join(out, "postings"))
    doc_stats = spark.read.parquet(os.path.join(out, "doc_stats"))
    return retrieval.bm25_lookup(postings, doc_stats, ["dup", "spark", "data"], k=10)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    names = [a for a in sys.argv[2:]] or DEFAULT_QUERIES
    target = os.environ.get("SPARK_GRAFT_SF_DIR", sf_dir())
    spark = get_spark("epss-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    base_dir = bench.build_scaled_workload(spark, target)
    saved = dict(bench.WORKLOAD_SCALE)
    try:
        for k in bench.WORKLOAD_SCALE:
            bench.WORKLOAD_SCALE[k] = saved[k] * mult
        big_dir = bench.build_scaled_workload(spark, target)
    finally:
        bench.WORKLOAD_SCALE.update(saved)

    if names == ["full"]:
        names = list(bench.HEADLINE) + list(PSEUDO)

    out: dict[str, dict] = {}
    for name in names:
        if name in PSEUDO:
            q = lambda s, d, name=name: _bm25_split(s, d, name)
        else:
            # full registry, not just the driver surface — pytest-tier
            # queries get scale evidence too
            q = registry.get_all_queries()[name]
        bench.force(q(spark, base_dir))  # warm (JIT + plan)
        t: dict[str, float] = {}
        for tag, d in [("bench_sec", base_dir), ("probe_sec", big_dir)]:
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                bench.force(q(spark, d))
                s = time.perf_counter() - t0
                best = s if best is None else min(best, s)
            t[tag] = round(best, 3)
        ratio = t["probe_sec"] / (t["bench_sec"] * mult)
        out[name] = {**t, "ratio_vs_linear": round(ratio, 3)}
        print(f"# {name}: {t['bench_sec']}s -> {t['probe_sec']}s "
              f"(vs linear x{mult}: {ratio:.2f})", flush=True)
    print(json.dumps({"mult": mult, "queries": out}))


if __name__ == "__main__":
    main()
