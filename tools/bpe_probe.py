"""BPE scale probe (PERF.md round-8): train >=512 merges and verify the
per-round cost stays FLAT (the localCheckpoint cadence bounds plan depth
at O(checkpoint_every), so round 500 costs what round 50 did), then
apply the learned table with the Arrow-batched segmenter and verify the
per-merge apply cost is sub-linear in the table size (the symbol-set
gate skips non-applicable merges; distinct-word memoization makes the
corpus cost dictionary-sized).

Usage: python tools/bpe_probe.py [n_merges] [sf_dir]
Prints one JSON line:
  {"n_merges": N, "train_sec": {...ladder...}, "per_round_flatness": r,
   "segment_batched_sec": {...ladder...}, "rows": n}
per_round_flatness = (time(N)/N) / (time(N/8)/(N/8)) — ~1.0 means flat;
an unbounded replace chain shows >> 1 here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark import tables
from epss_spark.operators import text
from epss_spark.session import get_spark, sf_dir


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    target = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", sf_dir()
    )
    spark = get_spark("epss-spark-bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the synthetic documents vocabulary saturates (~90 merges before
    # every word is one symbol), so the >=512-merge probe unions in a
    # deterministic md5-hex word stream (16-symbol alphabet, 32-char
    # words -> thousands of distinct mergeable pairs). The probe measures
    # TRAINING MECHANICS (per-round cost vs rank), which only needs a
    # vocabulary that does not run dry.
    from pyspark.sql import functions as F

    d = tables.load_table(spark, target, "documents").select(
        F.col("doc_id"), F.col("text")
    )
    hx = (
        tables.load_table(spark, target, "events")
        .limit(100_000)
        .select(
            (F.col("event_id") + 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ", F.md5(F.col("event_id").cast("string")),
                F.md5(F.concat(F.lit("x"), F.col("event_id").cast("string"))),
            ).alias("text"),
        )
    )
    docs = d.unionByName(hx).localCheckpoint()
    rows = docs.count()

    # training ladder: per-round cost must be flat, not O(rank)
    train_sec: dict[str, float] = {}
    merges_at: dict[int, list] = {}
    for k in (n // 8, n // 2, n):
        t0 = time.monotonic()
        m = text.bpe_merges(docs, n_merges=k).collect()
        train_sec[str(k)] = round(time.monotonic() - t0, 2)
        merges_at[k] = [(r.lhs, r.rhs) for r in m]
    got = len(merges_at[n])
    small = n // 8
    flatness = (train_sec[str(n)] / max(got, 1)) / (
        train_sec[str(small)] / max(len(merges_at[small]), 1)
    )

    # apply ladder with the batched segmenter: table-size sub-linearity
    seg_sec: dict[str, float] = {}
    for k in (n // 8, n):
        table = merges_at[n][:k]
        t0 = time.monotonic()
        out = text.bpe_segment_batched(docs, table)
        cnt = out.selectExpr("sum(n_bpe_tokens) s").first()["s"]
        seg_sec[str(k)] = round(time.monotonic() - t0, 2)
    print(
        json.dumps(
            {
                "n_merges": got,
                "train_sec": train_sec,
                "per_round_flatness": round(flatness, 2),
                "segment_batched_sec": seg_sec,
                "segment_tokens": int(cnt),
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
