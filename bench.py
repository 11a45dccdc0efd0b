"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line.

Each query is forced with the noop sink (full computation, no driver
collect), timed end-to-end including plan + execution. The flagship metric
is the quantization pipeline's input-rows/sec, comparable to the reference's
~6.9M rows/s (BASELINE.md; NOTES.md:38-39 of the reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from epss_spark import registry
from epss_spark.session import get_spark, sf_dir

HEADLINE = [
    "window_lag_diff",  # the flagship quantization kernel
    "epss_quantize_daily",  # full EPSS lifecycle composite
    "agg_groupby",  # TPC-H Q1 shape hash agg
    "join_multi",  # star join + agg (broadcast dims)
    "window_range_frame",  # 30-day trailing window
    "topk",  # TakeOrderedAndProject
    "dedup_exact_docs",  # fingerprint dedup
    "dedup_minhash",  # MinHash LSH + verify
    "ann_cosine_topk",  # brute-force similarity baseline
    "text_stats",  # text quality scan
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    target = os.environ.get("SPARK_GRAFT_SF_DIR", sf_dir())
    spark = get_spark("epss-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    # warm the JVM/codegen once with the cheapest query so per-query numbers
    # measure the plan, not first-job startup
    force(registry.QUERIES["topk"](spark, target))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(registry.QUERIES[name](spark, target))
        timings[name] = round(time.perf_counter() - t0, 4)

    # flagship throughput: input rows consumed by the quantization kernel
    n_events = spark.read.parquet(os.path.join(target, "events.parquet")).count()
    flagship_sec = timings["window_lag_diff"]
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": os.path.basename(os.path.normpath(target)),
                "flagship_rows_per_sec": round(n_events / flagship_sec) if flagship_sec else None,
                "flagship_input_rows": n_events,
            }
        )
    )


if __name__ == "__main__":
    main()
