"""Cluster-then-balance corpus curation end-to-end — train, audit, pick,
maintain.

The DataComp/SemDeDup-style curation flow over an embedding table:

  1. TRAIN: seed centroids from fixed row ids (or a reservoir sample at
     scale), refine with exact-arithmetic Lloyd updates (`kmeans_fit` —
     each iteration is one codegen assignment pass + one k-row
     aggregate; the model collects to the driver because it IS
     driver-sized). Production trains on a sample and assigns the full
     corpus once.
  2. AUDIT: `kmeans_stats` — per-cluster sizes, mean squared distance,
     centroid norms. A cluster holding half the corpus is the signal to
     raise k or to cap that cell harder in step 3.
  3. PICK: `cluster_balanced_sample` — at most N md5-ordered rows per
     cell, so dense regions (boilerplate, templates, near-dup families)
     stop dominating the training mix. Deterministic: any engine
     reproduces the same pick.
  4. CONTINUOUS: new embedding drops maintain the model without a
     corpus rescan (`streaming/kmeans_stream.py` — per-batch quantized-
     sum deltas against the frozen window model; the snapshot folds to
     EXACTLY kmeans_fit(all_seen, n_iter=1), and promoting it iterates
     Lloyd across maintenance windows).

Usage: python examples/cluster_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import clustering  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402
from epss_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("cluster-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()

    # 1. train: fixed-id init (engine-portable), two Lloyd updates
    init_ids = [0, 61, 122, 183, 244, 305, 366, 427]
    init = clustering.init_centroids_by_id(emb, init_ids)
    cents = clustering.kmeans_fit(emb, init, n_iter=2, dim=64)

    # 2. audit the model
    print("per-cluster diagnostics:")
    for r in clustering.kmeans_stats(emb, cents).orderBy("cluster_id").collect():
        print(
            f"  cluster {r.cluster_id}: n={r.n_points:4d}  "
            f"avg_d2={r.avg_d2:8.4f}  |c|={r.centroid_norm:6.3f}"
        )

    # 3. balanced curation pick: nothing dominates
    picks = clustering.cluster_balanced_sample(emb, cents, per_cluster=8)
    sizes = picks.groupBy("cluster_id").count().orderBy("cluster_id").collect()
    print("balanced sample per cell:", {r.cluster_id: r["count"] for r in sizes})

    # 4. continuous maintenance: two "days" of new drops refine the model
    #    without rescanning what came before
    from epss_spark.streaming import kmeans_stream as ks

    with tempfile.TemporaryDirectory() as tmp:
        state = os.path.join(tmp, "km_state")
        day1 = emb.filter(F.col("vec_id") % 2 == 0)
        day2 = emb.filter(F.col("vec_id") % 2 == 1)
        ks.process_kmeans_batch(day1, 0, state, cents, dim=64)
        ks.process_kmeans_batch(day2, 1, state, cents, dim=64)
        promoted = ks.kmeans_snapshot_centroids(spark, state, cents, dim=64)
        batch_equiv = clustering.kmeans_fit(emb, cents, n_iter=1, dim=64)
        assert promoted == batch_equiv  # bit-exact: integer sums commute
        print(
            "streamed one-step refresh == batch kmeans_fit(n_iter=1): "
            f"{promoted == batch_equiv} (promote it for the next window)"
        )

    spark.stop()


if __name__ == "__main__":
    main()
