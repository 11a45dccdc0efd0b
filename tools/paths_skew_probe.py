"""Gapless-bot probe for session_paths (PERF.md round-9 late): one bot
key emits `hot_frac` of ALL events at a steady sub-gap cadence, so the
gap rule never splits it — ONE session holding millions of rows, the
shape that melts a per-session collect. Compares the capped form
(max_path_events: rows past the cap drop inside the window exchange)
against the uncapped exact form on the same workload, and checks the
human-traffic rows agree between the two.

Usage: python tools/paths_skew_probe.py [n_events] [hot_frac] [cap]
Prints one JSON line:
  {"n_events": N, "hot_frac": f, "bot_session_events": H,
   "capped_sec": s, "uncapped_sec": s, "human_rows_equal": true}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark.operators import sessionize
from epss_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark("epss-spark-paths-skew")
    spark.sparkContext.setLogLevel("ERROR")

    n_hot = int(n * hot_frac)
    # bot key 0: one event per second forever (never a 30-min gap — one
    # session). Humans: 100k keys, one event per key per ~hour (every
    # session splits). Timestamps are integer seconds from one epoch.
    ev = (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("id") % 100_000 + 1)
            .alias("user_id"),
            F.when(F.col("id") < n_hot, F.col("id"))
            .otherwise(F.lit(4_000_000_000) + (F.col("id") / 100_000).cast("long") * 3600)
            .alias("sec"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        )
        .withColumn("ts", F.timestamp_seconds("sec"))
        .drop("sec")
        .persist()
    )
    ev.count()

    def run(max_path_events):
        t0 = time.time()
        out = sessionize.session_paths(
            ev, gap_seconds=1800, max_path_events=max_path_events
        )
        # human paths are short; fetch the bounded (path, len) histogram
        rows = out.filter(F.col("path_len") <= 64).count()
        bot = out.filter(F.col("path_len") > 64).collect()
        return time.time() - t0, rows, {(r.path_len, r.n_sessions) for r in bot}

    capped_sec, capped_rows, capped_bot = run(cap)
    uncapped_sec, uncapped_rows, uncapped_bot = run(None)
    print(json.dumps({
        "n_events": n,
        "hot_frac": hot_frac,
        "bot_session_events": n_hot,
        "cap": cap,
        "capped_sec": round(capped_sec, 3),
        "uncapped_sec": round(uncapped_sec, 3),
        "human_rows_equal": capped_rows == uncapped_rows,
        "bot_true_length_preserved": (
            {ln for ln, _ in capped_bot} == {ln for ln, _ in uncapped_bot}
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
