"""Source weighting by graph proximity — the DEPLOYMENT.md step-4a recipe.

Builds the item-item graph from a bipartite interaction log
(`cooccurrence_edges` — hot-group-capped, Jaccard-normalized), then runs
deterministic PageRank twice over the purchase network: uniform (global
authority) and seeded on a trusted whitelist (proximity to the trusted
set — Haveliwala's topic-sensitive walk). The seeded ranks are the
per-source weights a curation mix feeds to `sample_token_budget` /
`mix_temperature_budgets`.

Every rank is quantized message passing — BIGINT contributions, so the
nightly re-rank after an edge append is bit-reproducible under any
partitioning and auditable row-for-row against yesterday's artifact.

Usage: python examples/source_ranking.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import graph  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("source-ranking")
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    # 1. item-item projection of the bipartite purchase log: supplier
    #    pairs weighted by shared customers, hot groups capped, Jaccard
    #    correcting for popularity
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("g"), F.col("l_suppkey").alias("i")
    )
    proj = graph.cooccurrence_edges(
        pairs, "g", "i", max_group_size=1024, min_weight=2, normalize="jaccard"
    )
    print(f"co-purchase projection: {proj.count()} supplier-supplier edges")
    for r in proj.orderBy(F.col("jaccard").desc()).limit(3).collect():
        print(f"  {r.src} ~ {r.dst}: shared={r.w} jaccard={r.jaccard:.3f}")

    # 2. the customer<->supplier walk graph (both directions)
    base = pairs.groupBy("g", "i").agg(F.count(F.lit(1)).alias("w")).select(
        F.concat(F.lit("c"), F.col("g").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("i").cast("string")).alias("dst"),
        "w",
    )
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )

    # 3. global authority vs whitelist proximity
    uniform = graph.pagerank(edges, n_iter=5, weight_col="w")
    seeds = cust.filter(F.col("c_nationkey") == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    seeded = graph.pagerank(edges, n_iter=5, weight_col="w", seeds=seeds)

    sup_uniform = uniform.filter(F.col("node").startswith("s"))
    sup_seeded = seeded.filter(F.col("node").startswith("s"))
    print("top suppliers, global authority:")
    for r in sup_uniform.orderBy(F.col("rank").desc(), "node").limit(3).collect():
        print(f"  {r.node}: {r.rank:.6f}")
    print("top suppliers, proximity to nation-0 customers (the mix weights):")
    for r in sup_seeded.orderBy(F.col("rank").desc(), "node").limit(3).collect():
        print(f"  {r.node}: {r.rank:.6f}")


if __name__ == "__main__":
    main()
