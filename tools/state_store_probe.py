"""Carried-state store scaling probe (PERF.md round-10).

The funnel/transitions/ngrams maintenance streams resume each key's
state by folding the committed store (`keep_latest` over
`_read_committed`) every micro-batch. That fold is O(compacted store) —
a columnar scan + max_by aggregate, NOT O(batch) — so its cost grows
with the number of keys ever seen, independent of batch size. This
probe prices that growth: a FIXED 20k-event batch processed against
carried-state stores of increasing key cardinality.

What the numbers mean at 100 TB (DEPLOYMENT.md §streams): the fold is
a full columnar scan of one compacted file set per batch — fine up to
tens of millions of keys on one executor-set, and embarrassingly
shardable beyond that (every store in the family is strictly per-key,
so N independent streams each owning hash(key) % N are bit-identical
to one stream); the alternative at billions of keys is the
applyInPandasWithState form (streaming/stateful.py), which trades the
replay-idempotent bulk fold for incremental per-key state.

Usage: python tools/state_store_probe.py [batch_rows]
Prints one JSON line per store size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark.session import get_spark
from epss_spark.streaming import transitions_stream as ts
from epss_spark.streaming.dedup_stream import _write_epoch

STORE_SIZES = [100_000, 1_000_000, 4_000_000]


def main() -> None:
    batch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("epss-spark-state-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(".scratch", "state_probe")
    for n_keys in STORE_SIZES:
        store = os.path.join(base, f"tstate_{n_keys}")
        if os.path.exists(store):
            shutil.rmtree(store)
            for suffix in (".counts", ".late"):
                shutil.rmtree(store + suffix, ignore_errors=True)
        # epoch-0: one carried last-event row per key (the compacted shape)
        state0 = spark.range(n_keys).select(
            F.col("id").alias("user_id"),
            (F.lit(1_700_000_000_000_000) + F.col("id")).alias("us"),
            F.col("id").alias("tb"),
            F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(8)).cast("string")).alias("ty"),
            F.lit(0).cast("long").alias("__epoch"),
        )
        _write_epoch(state0.repartition(32), store, 0)

        # fixed batch: 20k fresh events over keys drawn from the store
        batch = spark.range(batch_rows).select(
            (F.col("id") * 97 % n_keys).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_100_000_000) + F.col("id")
            ).alias("ts"),
            (F.col("id") + 10_000_000).alias("event_id"),
            F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(8)).cast("string")).alias(
                "event_type"
            ),
        ).persist()
        batch.count()

        best = None
        for trial in range(3):
            t0 = time.perf_counter()
            ts.process_transitions_batch(batch, trial + 1, store)
            s = time.perf_counter() - t0
            best = s if best is None else min(best, s)
        print(json.dumps({
            "probe": "transitions_prior_fold",
            "store_keys": n_keys,
            "batch_rows": batch_rows,
            "sec_per_batch": round(best, 3),
        }))
        batch.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
