"""Profile the flagship quantization pipeline at bench scale, with the
cache cleared before every timed iteration so numbers are honest recomputes.

Usage: python tools/profile_flagship.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark.client import EPSSClient
from epss_spark.operators.quantize import quantize
from epss_spark.session import get_spark

N_DAYS, N_CVES = 100, 100_000
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
SCORES = os.path.join(ROOT, f"bench_scores_{N_DAYS}x{N_CVES}")  # 3200-file layout
SCORES1 = os.path.join(ROOT, f"bench_scores_{N_DAYS}x{N_CVES}_1fpd")  # 1 file/day


def force(df):
    df.write.format("noop").mode("overwrite").save()


def build_layout1(spark):
    if os.path.exists(os.path.join(SCORES1, "_SUCCESS")):
        return
    df = spark.read.parquet(SCORES)
    df.repartition("date").write.mode("overwrite").partitionBy("date").parquet(SCORES1)
    open(os.path.join(SCORES1, "_SUCCESS"), "a").close()


def timeit(spark, label, fn, n=3):
    best = None
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        sec = time.perf_counter() - t0
        best = sec if best is None else min(best, sec)
    rows = N_DAYS * N_CVES
    print(f"{label:34s} {best:7.3f}s  {rows/best/1e6:6.2f} M rows/s")
    return best


def main():
    spark = get_spark("flagship-profile")
    spark.sparkContext.setLogLevel("ERROR")
    hi = dt.date(2023, 3, 7) + dt.timedelta(days=N_DAYS - 1)
    lo = dt.date(2023, 3, 8)
    build_layout1(spark)

    clients = {
        "3200files": EPSSClient(spark, SCORES, max_date_resolver=lambda: hi),
        "1perday  ": EPSSClient(spark, SCORES1, max_date_resolver=lambda: hi),
    }
    # warm JIT/codegen
    force(clients["1perday  "].get_changed_scores(lo, hi))

    for tag, root in [("3200files", SCORES), ("1perday  ", SCORES1)]:
        timeit(spark, f"scan only            [{tag}]", lambda r=root: force(spark.read.parquet(r)))
        timeit(
            spark,
            f"scan+window+filter   [{tag}]",
            lambda r=root: force(
                quantize(spark.read.parquet(r), min_time=lo, max_time=hi).drop("delta")
            ),
        )
        c = clients[tag]
        timeit(spark, f"full pipeline        [{tag}]", lambda c=c: force(c.get_changed_scores(lo, hi)))


if __name__ == "__main__":
    main()
