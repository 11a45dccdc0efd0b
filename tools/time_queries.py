"""Time registry queries noop-isolated against the scaled bench workload
(guide §1.4): one warm-up execution per query, then N timed passes with
clearCache + GC between, reporting every pass and the min. Usage:

    python tools/time_queries.py q1 [q2 ...] [--passes N] [--dir DIR]

DIR defaults to the bench's scaled sf0.1 workload (built if absent, same
builder as bench.py so timings are comparable to the headline rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark import registry
from epss_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()

    spark = get_spark("epss-spark-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    target = args.dir
    if target is None:
        from bench import build_scaled_workload

        target = build_scaled_workload(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        spark.catalog.clearCache()
        force(registry.QUERIES[name](spark, target))
        times = []
        for i in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"timed:{name}#{i}")
            t0 = time.perf_counter()
            force(registry.QUERIES[name](spark, target))
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = {"passes": times, "min": min(times)}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
