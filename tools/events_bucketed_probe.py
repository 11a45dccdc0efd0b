"""Bucketed-layout probe for the events tier (PERF.md round-9 late):
every operator in the sessionize family — sessions, funnels,
transitions, paths — starts with the SAME key exchange on user_id. A
deployment that re-runs these daily at 100 TB should keep the events
table bucketed by user_id and sorted by (user_id, ts, event_id): the
bucketed scan satisfies the windows' clustering requirement, so the
exchange disappears from every plan (the cve-bucketed scores layout is
the same argument for the flagship; this probe is the events-tier
counterpart).

Usage: python tools/events_bucketed_probe.py [sf_dir] [mult]
Prints one JSON line per query:
  {"query": ..., "flat_sec": s, "bucketed_sec": s,
   "flat_exchanges": n, "bucketed_exchanges": n}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark.operators import sessionize as sz
from epss_spark.operators.layout import write_bucketed
from epss_spark.session import get_spark
from epss_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("epss-spark-events-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "events")
    # replicate with shifted keys/ids (the bench workload recipe) so the
    # probe runs at seconds-of-work scale
    n_users = base.agg(F.max("user_id")).collect()[0][0] + 1
    n_ids = base.agg(F.max("event_id")).collect()[0][0] + 1
    parts = []
    for r in range(mult):
        parts.append(
            base.select(
                (F.col("event_id") + r * n_ids).alias("event_id"),
                (F.col("user_id") + r * n_users).alias("user_id"),
                F.col("ts") , F.col("event_type"), F.col("value"),
            )
        )
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)

    flat_path = os.path.join(".scratch", f"events_flat_{mult}x")
    if not os.path.exists(os.path.join(flat_path, "_SUCCESS")):
        ev.repartition(32).write.mode("overwrite").parquet(flat_path)
    spark.sql("DROP TABLE IF EXISTS probe_events_bucketed")
    write_bucketed(
        spark.read.parquet(flat_path).repartition(32, "user_id"),
        "probe_events_bucketed",
        "user_id",
        num_buckets=32,
        sort_key=["user_id", "ts", "event_id"],
        path=os.path.join(".scratch", f"events_bucketed_{mult}x"),
    )

    flat = spark.read.parquet(flat_path)
    bucketed = spark.table("probe_events_bucketed")

    queries = {
        "session_stats": lambda d: sz.session_stats(
            d, gap_seconds=3600, tiebreak="event_id"
        ),
        "event_funnel": lambda d: sz.event_funnel(
            d, ["signup", "view", "purchase"]
        ),
        "event_transitions": lambda d: sz.event_transitions(d),
        "session_paths": lambda d: sz.session_paths(
            d, gap_seconds=3600, max_path_events=256
        ),
    }

    def run(df, fn):
        # construction is INSIDE the timer: event_funnel's key aggregate
        # is an eager bounded histogram fetch at construction time, so
        # timing only the returned (literal) plan would measure nothing
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        nx = plan.count("Exchange") - plan.count("BroadcastExchange")
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(df).write.format("noop").mode("overwrite").save()
            s = time.perf_counter() - t0
            best = s if best is None else min(best, s)
        return best, nx

    for name, fn in queries.items():
        fs, fx = run(flat, fn)
        bs, bx = run(bucketed, fn)
        print(json.dumps({
            "query": name,
            "flat_sec": round(fs, 3), "bucketed_sec": round(bs, 3),
            "flat_exchanges": fx, "bucketed_exchanges": bx,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
