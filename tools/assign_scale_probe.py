"""Large-k assignment ladder (PERF.md round-12): price the two physical
forms of nearest-centroid assignment (operators/clustering.py::
assign_clusters) against each other as k grows.

The codegen projection compiles k*dim literals into the Catalyst
expression tree — ideal at the oracle-checked shape (k=8, dim=64), but
plan construction + codegen cost grows O(k*dim) and at production k
(thousands of cells: IVF coarse quantizers, curation meshes) the plan
itself becomes the bottleneck. The Arrow-batched numpy kernel ships the
centroid matrix in the task closure instead: plan size O(1) in the
model, per-row cost O(k*dim) arithmetic in vectorized float64 — the
same dual-path trade as pq_topk vs pq_topk_batched.

Both forms are pinned bit-identical (tests/test_operators_ext.py), so
this probe measures COST only: wall time for a full assign+count over a
replicated embedding corpus, per impl, per k. Expect codegen to win or
tie through a few hundred cells' worth of k and degrade superlinearly
past ~1k centroids while the batched kernel stays near-flat; the
BATCHED_ASSIGN_CELLS auto threshold (8192 cells = k*dim) sits where the
curves cross comfortably before the codegen cliff.

Usage: python tools/assign_scale_probe.py [replicas] [k1,k2,...] [max_codegen_k]
Defaults: 50 replicas of sf0.1 embeddings (100k rows), k ladder
8,16,32,64,128. The expression rung is skipped above max_codegen_k
(default 128) — past the cliff it only wastes probe time.
Prints one JSON line:
  {"rows": N, "dim": 64, "ladder": {"8": {"codegen_sec": s, "batched_sec": s}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import clustering  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def synth_centroids(k: int, dim: int = 64) -> list[list[float]]:
    """Deterministic synthetic model: values spread in [0, 1) with no
    RNG (probe must be replayable)."""
    return [[((i * dim + j) % 997) / 997.0 for j in range(dim)] for i in range(k)]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    ladder = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [8, 16, 32, 64, 128]
    )
    max_codegen_k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("assign-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rep = spark.range(replicas).crossJoin(base).select(
        (F.col("id") * 1_000_000 + F.col("vec_id")).alias("vec_id"), "embedding"
    )
    rep.repartition(32).write.mode("overwrite").parquet("/tmp/assign_probe_corpus")
    corpus = spark.read.parquet("/tmp/assign_probe_corpus")
    n = corpus.count()

    def run(impl: str, cents) -> float:
        t0 = time.monotonic()
        out = clustering.assign_clusters(corpus, cents, impl=impl)
        out.groupBy("cluster_id").count().collect()
        return round(time.monotonic() - t0, 3)

    out = {}
    for k in ladder:
        cents = synth_centroids(k)
        row = {"batched_sec": run("batched", cents)}
        if k <= max_codegen_k:
            row["codegen_sec"] = run("codegen", cents)
        out[str(k)] = row
    print(json.dumps({"rows": n, "dim": 64, "replicas": replicas, "ladder": out}))
    spark.stop()


if __name__ == "__main__":
    main()
