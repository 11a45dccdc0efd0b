"""ANN recall-vs-cost harness (PERF.md round-8): measure recall@k of the
approximate tiers (LSH / IVF / PQ / IVF-PQ) against exact brute-force
cosine top-k, at REALISTIC settings — the identity pins in the test suite
only cover degenerate settings (full probe == exact), so until now the
100 TB index was tuned blind.

Vectors are L2-normalized first so the PQ tiers' L2 ranking and the
ground truth's cosine ranking agree on ordering; recall loss then
measures exactly pruning (LSH bucket / IVF list) + quantization (PQ
codes), never metric mismatch.

The testdata embeddings are near-iid random (within-label mean cosine
~0.01), which is the WORST case for any ANN index — distance
concentration makes the true top-k nearly arbitrary, so pruning and
quantization shed recall fast. Pass `clustered` as the sf_dir to run the
same ladder on deterministic clustered vectors (32 centers + noise, the
shape real embedding corpora have); the gap between the two runs
separates "index is broken" from "corpus has no neighborhood structure".

Usage: python tools/ann_recall.py [k] [n_queries] [sf_dir|clustered]
Prints one JSON line:
  {"k": 10, "n": 2000, "exact_sec": s, "variants": {
     "lsh_p4": {"recall": r, "sec": s, "scan_frac": f}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark import tables
from epss_spark.operators import similarity
from epss_spark.session import get_spark, sf_dir


def topk_sets(df, k):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def recall(approx: dict, exact: dict, k: int) -> float:
    if not exact:
        return 0.0
    return sum(len(approx.get(q, set()) & s) / len(s) for q, s in exact.items()) / len(exact)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    target = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", sf_dir()
    )
    spark = get_spark("epss-spark-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    if target == "clustered":
        import numpy as np

        rng = np.random.default_rng(7)
        centers = rng.standard_normal((32, 64))
        rows = [
            (i, [float(x) for x in centers[i % 32] + 0.35 * rng.standard_normal(64)])
            for i in range(2000)
        ]
        raw = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    else:
        raw = tables.load_table(spark, target, "embeddings")
    emb = similarity.normalize_vectors(raw).localCheckpoint()
    n = emb.count()
    stride = max(n // n_q, 1)
    queries = emb.filter(F.col("vec_id") % stride == 0).localCheckpoint()

    t0 = time.monotonic()
    exact = topk_sets(similarity.cosine_topk(queries, emb, k=k), k)
    exact_sec = round(time.monotonic() - t0, 2)

    out: dict = {}

    def run(name, fn, scan_frac):
        t0 = time.monotonic()
        approx = topk_sets(fn(), k)
        out[name] = {
            "recall": round(recall(approx, exact, k), 4),
            "sec": round(time.monotonic() - t0, 2),
            "scan_frac": round(scan_frac, 4),
        }

    for p in (2, 4, 6, 8):
        run(
            f"lsh_p{p}",
            lambda p=p: similarity.lsh_topk(queries, emb, k=k, n_planes=p),
            1 / 2**p,
        )

    # multiprobe: same 8-plane index, query probes home + lowest-margin
    # flip buckets — scan_frac scales with n_probes, not planes
    for np_ in (2, 4, 8):
        run(
            f"lsh_p8_mp{np_}",
            lambda np_=np_: similarity.lsh_multiprobe_topk(
                queries, emb, k=k, n_planes=8, n_probes=np_
            ),
            np_ / 2**8,
        )

    # two-stage cheap-index path (round 9): stage 1 on the 16-dim
    # Matryoshka prefix (planes + shortlist ordering both truncated —
    # 1/4 of the scan bytes), stage 2 exact full-dim re-rank. r=k is the
    # truncated-only baseline (same shortlist membership as truncated
    # multiprobe top-k); r >> k shows what re-rank + a wider shortlist
    # buys at the SAME probed-bucket scan fraction.
    for r in (k, 4 * k, 10 * k):
        run(
            f"lsh16_p8_mp4_rr{r}",
            lambda r=r: similarity.lsh_multiprobe_rerank(
                queries, emb, k=k, r=r, shortlist_dims=16, n_planes=8, n_probes=4
            ),
            4 / 2**8,
        )

    n_lists = 16
    cents = similarity.train_ivf_centroids(emb, n_lists=n_lists)
    for np_ in (1, 2, 4, 8, 16):
        run(
            f"ivf_l{n_lists}_p{np_}",
            lambda np_=np_: similarity.ivf_topk(
                queries, emb, k=k, n_lists=n_lists, n_probe=np_, centroids=cents
            ),
            np_ / n_lists,
        )

    for m in (4, 8, 16):
        books = similarity.train_pq_centroids(emb, m=m, k=8)
        run(
            f"pq_m{m}",
            lambda books=books: similarity.pq_topk(queries, emb, books, k=k),
            1.0,
        )

    books8 = similarity.train_pq_centroids(emb, m=8, k=8)
    for np_ in (2, 4, 8, 16):
        run(
            f"ivfpq_l{n_lists}_m8_p{np_}",
            lambda np_=np_: similarity.ivfpq_topk(
                queries, emb, cents, books8, k=k, n_probe=np_
            ),
            np_ / n_lists,
        )

    # production shape: ADC shortlist of r >> k, then exact re-rank —
    # recall then measures shortlist coverage, not ADC ranking noise
    for np_, r in ((4, 10 * k), (8, 10 * k), (8, 4 * k)):
        run(
            f"ivfpq_l{n_lists}_m8_p{np_}_rr{r}",
            lambda np_=np_, r=r: similarity.rerank_exact(
                similarity.ivfpq_topk(queries, emb, cents, books8, k=r, n_probe=np_),
                queries, emb, k=k,
            ),
            np_ / n_lists,
        )
    run(
        f"pq_m8_rr{10 * k}",
        lambda: similarity.rerank_exact(
            similarity.pq_topk(queries, emb, books8, k=10 * k), queries, emb, k=k
        ),
        1.0,
    )

    # realistic codebooks (k=64 codes/subspace) via the Arrow-batched ADC
    # kernels — the expression forms melt at this size (PERF.md ladder)
    books64 = similarity.train_pq_centroids(emb, m=8, k=64)
    run(
        "pq_m8_k64_batched",
        lambda: similarity.pq_topk_batched(queries, emb, books64, k=k),
        1.0,
    )
    run(
        f"ivfpq_l{n_lists}_m8_k64_p4_batched",
        lambda: similarity.ivfpq_topk_batched(
            queries, emb, cents, books64, k=k, n_probe=4
        ),
        4 / n_lists,
    )
    run(
        f"ivfpq_l{n_lists}_m8_k64_p4_rr{4 * k}",
        lambda: similarity.rerank_exact(
            similarity.ivfpq_topk_batched(
                queries, emb, cents, books64, k=4 * k, n_probe=4
            ),
            queries, emb, k=k,
        ),
        4 / n_lists,
    )

    print(
        json.dumps(
            {"k": k, "n": n, "n_queries": queries.count(),
             "exact_sec": exact_sec, "variants": out}
        )
    )


if __name__ == "__main__":
    main()
