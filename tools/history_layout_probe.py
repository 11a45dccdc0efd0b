"""History-tier layout + hot-key probes (PERF.md round-10).

Probe A — serving layout for the SCD-2 interval table: `history_as_of`
and `history_changed_between` are zero-shuffle filters regardless of
layout, but `history_lookup`'s per-probe join sort-merges on the key
once the history outgrows broadcast. A deployment keeping a 100 TB
history should store it url-bucketed and (url, valid_from)-sorted: the
bucketed scan satisfies the join's clustering requirement, deleting the
history-side exchange AND its sort from every lookup (the cve-bucketed
scores layout / user_id-bucketed events layout argument, applied to the
history tier). Broadcast stays the small-history fast path; this probe
forces the non-broadcast regime (autoBroadcastJoinThreshold=-1) to
measure the shape that matters at scale.

Probe B — hot-key compaction: `snapshot_history` over a changelog where
ONE url carries half of all versions, vs a uniform changelog of the
same total size. The plan is windows-only (lag + running-sum + agg +
lead riding one key exchange; window sorts stream and spill — no
per-key array materialization), so the skewed run should degrade only
by the serial cost of one giant sorted partition, never OOM. The probe
prints both timings so the claim is a number, not an assertion
(funnel/paths skew probes precedent).

Usage: python tools/history_layout_probe.py [n_rows] [n_probes]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark.operators import dedup
from epss_spark.operators.layout import write_bucketed
from epss_spark.session import get_spark

N_URLS_PER_ROW = 50  # uniform changelog: ~50 versions per url
RUN_LEN = 4  # content changes every ~4 fetches


def synth_changelog(spark, n_rows: int, hot_share: float = 0.0):
    """Synthetic crawl changelog (url, version, fp): version is globally
    unique (per-key versions strictly increasing), fp flips every
    ~RUN_LEN fetches of a url. hot_share routes that fraction of all
    rows to url 0 — the bot-recrawl hot key."""
    n_urls = max(2, n_rows // N_URLS_PER_ROW)
    df = spark.range(n_rows)
    uniform = F.pmod(F.xxhash64(F.col("id")), F.lit(n_urls))
    if hot_share > 0:
        url = F.when(
            F.pmod(F.col("id"), F.lit(1000)) < int(hot_share * 1000), F.lit(0)
        ).otherwise(uniform)
    else:
        url = uniform
    return df.select(
        F.concat(F.lit("https://example.com/p"), url.cast("string")).alias("url"),
        F.col("id").alias("version"),
        F.md5(
            F.concat(url.cast("string"), F.lit(":"),
                     (F.col("id") / (n_urls * RUN_LEN)).cast("long").cast("string"))
        ).alias("fp"),
    )


def timed_noop(df, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        s = time.perf_counter() - t0
        best = s if best is None else min(best, s)
    return best


def exchange_count(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.count("Exchange") - p.count("BroadcastExchange")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("epss-spark-history-layout")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- Probe A: serving layout for history_lookup ----
    flat_path = os.path.join(".scratch", f"hist_flat_{n_rows}")
    if not os.path.exists(os.path.join(flat_path, "_SUCCESS")):
        hist = dedup.snapshot_history(
            synth_changelog(spark, n_rows), "url", "version", "fp"
        )
        hist.repartition(32).write.mode("overwrite").parquet(flat_path)
    spark.sql("DROP TABLE IF EXISTS probe_history_bucketed")
    write_bucketed(
        spark.read.parquet(flat_path).repartition(32, "url"),
        "probe_history_bucketed",
        "url",
        num_buckets=32,
        sort_key=["url", "valid_from"],
        path=os.path.join(".scratch", f"hist_bucketed_{n_rows}"),
    )
    probes_path = os.path.join(".scratch", f"hist_probes_{n_rows}_{n_probes}")
    if not os.path.exists(os.path.join(probes_path, "_SUCCESS")):
        n_urls = max(2, n_rows // N_URLS_PER_ROW)
        spark.range(n_probes).select(
            F.concat(
                F.lit("https://example.com/p"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(n_urls)).cast("string"),
            ).alias("url"),
            F.col("id").alias("probe_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(n_rows)).alias("version"),
        ).repartition(32).write.mode("overwrite").parquet(probes_path)

    flat = spark.read.parquet(flat_path)
    bucketed = spark.table("probe_history_bucketed")
    probes = spark.read.parquet(probes_path)
    # force the non-broadcast regime: at 100 TB the history does not fit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    for name, h in (("flat", flat), ("bucketed", bucketed)):
        out = dedup.history_lookup(h, probes, key="url", point_col="version")
        print(json.dumps({
            "probe": "lookup_layout", "layout": name,
            "exchanges": exchange_count(out),
            "sec": round(timed_noop(out), 3),
            "history_rows": flat.count(), "probe_rows": n_probes,
        }))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # as-of reads: zero-shuffle filters in BOTH layouts; the bucketed
    # (url, valid_from)-sorted files additionally zone-prune on
    # valid_from at real scale
    mid = n_rows // 2
    for name, h in (("flat", flat), ("bucketed", bucketed)):
        out = dedup.history_as_of(h, mid)
        print(json.dumps({
            "probe": "as_of", "layout": name,
            "exchanges": exchange_count(out),
            "sec": round(timed_noop(out), 3),
        }))

    # ---- Probe B: snapshot_history hot-key ----
    for name, hot in (("uniform", 0.0), ("hot_key_50pct", 0.5)):
        log = synth_changelog(spark, n_rows, hot_share=hot)
        out = dedup.snapshot_history(log, "url", "version", "fp")
        print(json.dumps({
            "probe": "snapshot_history_skew", "changelog": name,
            "rows": n_rows,
            "sec": round(timed_noop(out), 3),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
