"""Incremental semantic-index probe (PERF.md round-14): price the
nightly `dedup_batch_semantic` loop the way it actually runs — a
CONSTANT-sized daily batch against a GROWING indexed corpus — and
measure the one parameter that decides whether it scales: cell count.

The SemDeDup containment makes per-day cost O(batch x cell density).
Density is corpus_size / k, so k MUST grow with the corpus (the same
contract as IVF n_lists; DEPLOYMENT.md's semantic-index row). A
straight 10x corpus probe at the registry's fixed k=8 therefore
measures a mis-sized model, not the operator — this probe measures
both, explicitly:

  rung A:  corpus N,   k = 8    (the 1x reference shape)
  rung B:  corpus 10N, k = 8    (fixed k: density 10x — the
                                 anti-pattern; expect ~10x rung A)
  rung C:  corpus 10N, k = 80   (scaled k: density unchanged — the
                                 production recipe; expect ~rung A)

A/C parity is the pass criterion: the nightly cost depends on density,
not corpus size. The centroid model uses fixed spread ids
(init_centroids_by_id), deterministic like everything else; the batch
re-ids to beyond-corpus ids (the append-only invariant of daily
drops).

Usage: python tools/semantic_index_probe.py [base_replicas] [batch_rows]
Defaults: 16 (~32k-vector rung-A corpus from sf0.1), 2000.
Prints one JSON line:
  {"batch_rows": B, "rungs": {"A": {"corpus": N, "k": 8, "sec": s}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import similarity  # noqa: E402
from epss_spark.operators.clustering import init_centroids_by_id  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def build_corpus(spark, base, replicas: int, path: str):
    rep = (
        spark.range(replicas)
        .crossJoin(base)
        .select((F.col("id") * 1_000_000 + F.col("vec_id")).alias("vec_id"), "embedding")
    )
    rep.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    base_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("semantic-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # constant daily batch, re-ided beyond every corpus id (append-only)
    batch = (
        base.filter(F.col("vec_id") < batch_rows)
        .select((F.col("vec_id") + 10_000_000_000).alias("vec_id"), "embedding")
    )
    batch.write.mode("overwrite").parquet("/tmp/semidx_batch")
    batch = spark.read.parquet("/tmp/semidx_batch")
    batch.count()

    rungs = {}
    for rung, (replicas, k) in {
        "A": (base_replicas, 8),
        "B": (base_replicas * 10, 8),
        "C": (base_replicas * 10, 80),
    }.items():
        corpus = build_corpus(spark, base, replicas, f"/tmp/semidx_corpus_{replicas}")
        n = corpus.count()
        # deterministic spread seed ids: k distinct vectors of replica 0
        seed_ids = [i * (1999 // k) for i in range(k)]
        cents = init_centroids_by_id(corpus, seed_ids)
        index = similarity.semantic_index(corpus, cents)
        index.write.mode("overwrite").parquet(f"/tmp/semidx_index_{replicas}_{k}")
        index = spark.read.parquet(f"/tmp/semidx_index_{replicas}_{k}")
        t0 = time.monotonic()
        kept, new_rows = similarity.dedup_batch_semantic(batch, index, cents)
        nk = kept.count()
        ni = new_rows.count()
        sec = round(time.monotonic() - t0, 3)
        rungs[rung] = {"corpus": n, "k": k, "sec": sec, "kept": nk, "appended": ni}
        print(f"# rung {rung}: {rungs[rung]}", file=sys.stderr)
    print(json.dumps({"batch_rows": batch_rows, "rungs": rungs}))
    spark.stop()


if __name__ == "__main__":
    main()
