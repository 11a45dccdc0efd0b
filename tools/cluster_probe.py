"""Clustering quality harness (PERF.md round-11): show the deterministic
Lloyd trainer (operators/clustering.py::kmeans_fit) actually RECOVERS
structure, not just matches its DuckDB oracle — the oracle pins
cross-engine equality, this probe pins usefulness.

Vectors are planted Gaussian clusters (the ann_recall `clustered` shape:
k_true spread centers + noise), labeled by their generating center. The
probe trains from a deliberately BAD init (the k lowest ids — with
round-robin generation these cover distinct clusters; pass `worst` to
seed all k from the SAME planted cluster) and reports, per Lloyd
iteration: total inertia (sum of squared distance to the assigned
centroid) and majority-label purity vs the planted labels
(operators/clustering.py::cluster_label_purity). A working trainer drives
purity -> ~1.0 and inertia monotonically down; a broken update rule
plateaus at the init's numbers.

The testdata embeddings are near-iid (distance concentration — purity
stays at ~1/k there by construction), so like ann_recall this probe
generates its own structured corpus rather than using sf testdata.

Usage: python tools/cluster_probe.py [n_vectors] [k] [spread|worst|ff]
Prints one JSON line:
  {"n": 4000, "k": 8, "iters": {"0": {"inertia": i, "purity": p}, ...}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import clustering  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def weighted_purity(stats_rows) -> float:
    tot = sum(r["n_points"] for r in stats_rows)
    hit = sum(r["n_majority"] for r in stats_rows)
    return hit / tot if tot else 0.0


def total_inertia(spark, emb, cents) -> float:
    st = clustering.kmeans_stats(emb, cents)
    row = st.agg(F.sum(F.col("avg_d2") * F.col("n_points")).alias("i")).collect()[0]
    return float(row["i"])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mode = sys.argv[3] if len(sys.argv) > 3 else "spread"
    worst = mode == "worst"

    import numpy as np

    spark = get_spark("epss-spark-cluster-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(11)
    centers = 4.0 * rng.standard_normal((k, 64))
    rows = [
        (
            i,
            [float(x) for x in centers[i % k] + 0.5 * rng.standard_normal(64)],
            i % k,
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).localCheckpoint()

    if worst:
        # all k seeds from planted cluster 0: ids 0, k, 2k, ... — the
        # degenerate init a naive "first k rows of one file" gives
        init_ids = [i * k for i in range(k)]
        init = clustering.init_centroids_by_id(emb, init_ids)
    elif mode == "ff":
        # farthest-first traversal from the same degenerate start point —
        # the deterministic rescue for the `worst` plateau
        init = clustering.farthest_first_init(emb, k, start_id=0)
    else:
        init_ids = list(range(k))
        init = clustering.init_centroids_by_id(emb, init_ids)

    out: dict = {}
    cents = init
    for it in [0, 1, 2, 4, 8]:
        if it > 0:
            prev = [0, 0, 1, 2, 4][[0, 1, 2, 4, 8].index(it)]
            cents = clustering.kmeans_fit(emb, cents, n_iter=it - prev, dim=64)
        stats = clustering.cluster_label_purity(emb, cents).collect()
        out[str(it)] = {
            "inertia": round(total_inertia(spark, emb, cents), 1),
            "purity": round(weighted_purity(stats), 4),
            "n_cells": len(stats),
        }

    print(json.dumps({"n": n, "k": k, "init": mode, "iters": out}))
    spark.stop()


if __name__ == "__main__":
    main()
