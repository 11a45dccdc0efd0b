"""Incremental analytics from daily sketch tables — distinct counts and
hot-token frequencies over ANY date window without re-reading history.

The pattern: each nightly batch writes its own tiny sketch parquet
(HLL registers: <= m rows per group; Count-Min cells: <= d*w rows).
A window query MERGES the daily sketches — max for HLL, sum for CMS —
which is exact by the sketch merge laws (pinned in tests/test_sketches).
History is never rescanned; the merge input is KBs per day regardless of
how many billions of rows each day held.

Usage: python examples/incremental_sketches.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import sketches  # noqa: E402
from epss_spark.operators.text import tokens  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-sketches")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # stand-in for three daily crawl batches
    days = [docs.filter(F.col("doc_id") % 3 == d) for d in range(3)]

    # --- nightly: one HLL sketch of distinct fingerprint-grade tokens
    # per source, one CMS of token frequencies, per day ---------------
    def day_tokens(d):
        return d.select("source", F.explode(tokens("text")).alias("tok"))

    hll_days = [
        sketches.hll_registers(day_tokens(d), ["source"], "tok") for d in days
    ]
    cms_days = [sketches.cms_build(day_tokens(d).select("tok"), "tok") for d in days]
    for i, h in enumerate(hll_days):
        print(f"day {i}: HLL sketch rows = {h.count()} (bounded by m per source)")

    # --- any-window query: merge the daily sketches ------------------
    merged = sketches.hll_merge(*hll_days, group_cols=["source"])
    est = sketches.hll_estimate(merged, ["source"]).orderBy("source")
    exact = (
        day_tokens(docs)
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("exact"))
        .orderBy("source")
    )
    print("per-source distinct tokens, 3-day window (HLL vs exact):")
    for e, x in zip(est.collect(), exact.collect()):
        err = abs(e.hll_distinct - x.exact) / x.exact
        print(f"  {e.source}: est {e.hll_distinct:.0f} vs exact {x.exact} ({err:.1%})")

    cms_window = sketches.cms_merge(*cms_days)
    cand = spark.createDataFrame([("the",), ("and",), ("dup",)], "tok string")
    print("hot-token counts from the merged CMS (overestimate-only):")
    for r in sketches.cms_estimate(cms_window, cand, "tok").orderBy("tok").collect():
        print(f"  {r.tok}: ~{r.cms_count}")

    # --- q-digest: token-length quantiles over the window ------------
    def day_lengths(d):
        return d.select(F.size(tokens("text")).alias("n_tokens"))

    qd_days = [
        sketches.qdigest_build(day_lengths(d), "n_tokens", levels=8, k=16)
        for d in days
    ]
    qd_window = sketches.qdigest_merge(*qd_days, levels=8, k=16)
    print("token-length quantiles from the merged q-digest:")
    for r in sketches.qdigest_quantiles(qd_window, [0.5, 0.9, 0.99], levels=8).collect():
        print(f"  p{int(r.q * 100)}: <= {r.value} tokens")

    # the merge-law guarantee: merging the daily sketches IS the sketch
    # of the whole window (bit-for-bit, see tests/test_sketches.py)
    full = sketches.hll_registers(day_tokens(docs), ["source"], "tok")
    same = (
        sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    )
    print(f"merge(day sketches) == sketch(window) exactly: {same}")


if __name__ == "__main__":
    main()
