"""Plan-BUILD vs EXECUTION split for registry queries (optimization r15,
guide §7.3 driver-side planning): r14 change #11 found ~6 s of py4j
expression construction invisible to Exchange-counting plan audits. This
tool times, per query, against the scaled bench workload:

  - construct_sec: the Python call that builds the DataFrame (every
    F.lit/Column op is a synchronous py4j round trip; eager stats jobs
    embedded in query builders land here too)
  - plan_sec: analysis + optimization + physical planning (executedPlan)
  - exec_sec: the noop-sink execution of the already-planned frame

Usage: python tools/build_exec_split.py [q1 q2 ...]  (default: the full
driver surface + headline queries). One warm pass per query first so JIT
and FileIndex caches don't masquerade as build cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark import registry
from epss_spark.session import get_spark


def main() -> None:
    spark = get_spark("epss-spark-buildsplit")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    from bench import HEADLINE, build_scaled_workload

    target = build_scaled_workload(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    names = sys.argv[1:] or list(
        dict.fromkeys(list(registry.DRIVER_SURFACE) + HEADLINE)
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warm:{name}")
        force(fn(spark, target))  # warm pass: JIT + FileIndex cache
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"split:{name}")
        t0 = time.perf_counter()
        df = fn(spark, target)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        force(df)
        t3 = time.perf_counter()
        out[name] = {
            "construct": round(t1 - t0, 4),
            "plan": round(t2 - t1, 4),
            "exec": round(t3 - t2, 4),
        }
        print(
            f"{name:32s} construct={out[name]['construct']:7.3f} "
            f"plan={out[name]['plan']:7.3f} exec={out[name]['exec']:7.3f}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
