"""Iterative graph analytics over entity networks — deterministic
weighted PageRank (Page et al. 1999, "The PageRank Citation Ranking"),
the random-walk importance measure a data pipeline uses to weight
sources (domain authority in a crawl link graph, supplier/customer
centrality in a transaction network) and that curation recipes like
Common-Crawl-level domain ranking build on. Complements the pointer-
jumping connected components in operators/dedup.py: CC answers "which
nodes form one group", PageRank answers "which nodes matter".

Determinism contract (the kmeans/classifier discipline applied to
message passing): per-edge contributions quantize to BIGINT
(floor(((rank * w) / out_w) * quant + 0.5)) before the per-node sum,
so shuffle order cannot perturb a single rank; dangling mass folds
through the same quantized sum collected driver-side; the per-node
update is a fixed chain of literal ops the DuckDB oracle replays
CTE-for-CTE. The quantization IS the formulation here (documented, not
hidden): each node's rank differs from the real-arithmetic fixpoint by
at most in_degree/quant per iteration — at quant 1e6 that is 1e-6 per
incoming edge, far below any ranking decision, and in exchange every
engine, partitioning, and retry produces the identical bits.

Scale shape:
  * static per-graph prep (nodes, out-weights, the dangling set) is
    ONE pass over the edge list, localCheckpoint'd;
  * each iteration is one edges-ranks join (shuffle on src — pre-
    partition/bucket the edge list by src and the join co-locates,
    DEPLOYMENT.md) + one map-side-combinable per-dst BIGINT aggregate
    + one driver-sized dangling scalar; ranks stay (node, double) —
    never wider than the node set;
  * plan depth is bounded by `checkpoint_every` (localCheckpoint, the
    BPE/CC precedent), so hundreds of iterations cannot blow analysis
    time or lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000.0
SUM_GUARD = 2**62


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    quant: float = QUANT,
    checkpoint_every: int = 8,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """Weighted PageRank over a directed edge list: returns
    (node, rank) for every node appearing as src or dst, after
    `n_iter` synchronous iterations. Unweighted edges
    (weight_col=None) count 1 each; parallel edges accumulate.
    Dangling mass (nodes with no out-edges) redistributes through the
    teleport vector, so total rank stays ~1 (up to the documented
    quantization grain).

    Uniform (seeds=None):
      r_{t+1}(v) = ((1-d)/N + d*(dm_t/quant)/N) + d*(S_t(v)/quant)
    Personalized (Haveliwala 2002, topic-sensitive PageRank): `seeds`
    is a one-column frame of trusted nodes; the walk teleports ONLY to
    them, so rank measures proximity to the seed set — the
    seed-expansion primitive curation recipes use to score sources by
    closeness to a trusted whitelist:
      r_{t+1}(v) = ((1-d) + d*(dm_t/quant)) * tele(v) + d*(S_t(v)/quant)
    with tele(v) = 1/|S in graph| on seeds, 0 elsewhere. Seeds not in
    the graph are ignored; an all-absent seed set raises. S_t(v) is
    the BIGINT sum of quantized weighted contributions, dm_t the
    quantized dangling mass — every division and add in a fixed order,
    mirrored by the oracle."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"), w.alias("__w")
    )
    bad = e.filter(F.col("__w") < 1).limit(1).collect()
    if bad:
        raise ValueError("pagerank: edge weights must be >= 1 integers")
    # static prep: one pass, checkpointed — nodes, per-src out-weight,
    # and the dangling set (nodes with no out-edges)
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if not n_nodes:
        raise ValueError("pagerank: empty edge list")
    out_w = (
        e.groupBy("__src").agg(F.sum("__w").alias("__ow")).localCheckpoint(eager=True)
    )
    dangling = nodes.join(
        out_w.select(F.col("__src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    n_dangling = dangling.count()
    em = e.join(out_w, "__src").localCheckpoint(eager=True)

    d = float(damping)
    n_f = float(n_nodes)
    tele = None
    if seeds is not None:
        seed_nodes = (
            seeds.select(F.col(seed_col).alias("node")).distinct().join(nodes, "node")
            .localCheckpoint(eager=True)
        )
        n_seeds = seed_nodes.count()
        if not n_seeds:
            raise ValueError("pagerank: no seed node appears in the graph")
        tele = (
            nodes.join(seed_nodes.withColumn("__is", F.lit(1)), "node", "left")
            .select(
                "node",
                F.when(F.col("__is").isNotNull(), F.lit(1.0 / float(n_seeds)))
                .otherwise(F.lit(0.0))
                .alias("__t"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = tele.select("node", F.col("__t").alias("rank"))
    else:
        ranks = nodes.select("node", F.lit(1.0 / n_f).alias("rank"))
    for t in range(n_iter):
        if n_dangling:
            q_rank = F.floor(F.col("rank") * F.lit(quant) + F.lit(0.5)).cast("long")
            dm_row = (
                dangling.join(ranks, "node").agg(F.sum(q_rank).alias("dm")).collect()[0]
            )
            dm = int(dm_row["dm"] or 0)
        else:
            # no dangling nodes (e.g. any bidirectional graph): skip the
            # per-iteration driver action — dm = 0 exactly, and x + 0.0
            # leaves the base term bit-identical to the general path
            dm = 0
        if abs(dm) >= SUM_GUARD:
            raise ValueError("pagerank: dangling-mass sum exceeds the 2^62 guard")
        contrib = F.floor(
            ((F.col("rank") * F.col("__w").cast("double")) / F.col("__ow").cast("double"))
            * F.lit(quant)
            + F.lit(0.5)
        ).cast("long")
        sums = (
            em.join(ranks, em["__src"] == ranks["node"])
            .select(F.col("__dst").alias("node"), contrib.alias("__q"))
            .groupBy("node")
            .agg(F.sum("__q").alias("__s"))
        )
        spread = F.lit(d) * (
            F.coalesce(F.col("__s"), F.lit(0)).cast("double") / F.lit(quant)
        )
        if tele is not None:
            c1 = (1.0 - d) + d * (float(dm) / quant)
            ranks = tele.join(sums, "node", "left").select(
                "node", (F.lit(c1) * F.col("__t") + spread).alias("rank")
            )
        else:
            base = (1.0 - d) / n_f + d * (float(dm) / quant) / n_f
            ranks = nodes.join(sums, "node", "left").select(
                "node", (F.lit(base) + spread).alias("rank")
            )
        if checkpoint_every and (t + 1) % checkpoint_every == 0 and t + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = 1024,
    min_weight: int = 1,
    normalize: str | None = None,
) -> DataFrame:
    """Bipartite-to-unipartite projection: undirected co-occurrence
    edges (src, dst, w) where w counts the groups in which both items
    appear — customers shared by two suppliers, sessions shared by two
    pages, documents shared by two entities. The standard prep step
    for item-item graphs (feed the result to `pagerank`).

    Scale shape: distinct (group, item) is one keyed exchange; group
    sizes ride the same key; the within-group self-join co-locates on
    the group exchange. The quadratic hazard is a HOT GROUP — one
    group of g items emits g*(g-1)/2 pairs — so groups larger than
    `max_group_size` are DROPPED entirely (the LSH max_bucket_size /
    session-paths cap discipline: a documented skew guard, not a
    silent truncation — pass None for exact mode on data known
    bounded). Emits src < dst once per pair; `min_weight` prunes the
    long tail of single-co-occurrence edges before they hit the
    downstream graph.

    `normalize="jaccard"` adds a `jaccard` column = w / (deg(src) +
    deg(dst) - w) over the CAPPED group universe — raw counts favor
    globally popular items; Jaccard asks what fraction of either
    item's groups are shared. One extra per-item degree aggregate
    (rides the same distinct) + two pair-side joins; the single
    division is IEEE-exact, so the column stays oracle-checkable."""
    if max_group_size is not None and max_group_size < 2:
        raise ValueError(f"max_group_size must be >= 2 or None, got {max_group_size}")
    if min_weight < 1:
        raise ValueError(f"min_weight must be >= 1, got {min_weight}")
    if normalize not in (None, "jaccard"):
        raise ValueError(f"normalize must be None or 'jaccard', got {normalize!r}")
    d = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i")).distinct()
    if max_group_size is not None:
        sizes = d.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
        d = d.join(
            sizes.filter(F.col("__n") <= max_group_size).select("__g"), "__g"
        )
    a = d.select(F.col("__g"), F.col("__i").alias("src"))
    b = d.select(F.col("__g"), F.col("__i").alias("dst"))
    pairs = (
        a.join(b, "__g")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    if min_weight > 1:
        pairs = pairs.filter(F.col("w") >= min_weight)
    if normalize == "jaccard":
        deg = d.groupBy("__i").agg(F.count(F.lit(1)).alias("__deg"))
        pairs = (
            pairs.join(deg.select(F.col("__i").alias("src"), F.col("__deg").alias("__da")), "src")
            .join(deg.select(F.col("__i").alias("dst"), F.col("__deg").alias("__db")), "dst")
            .select(
                "src",
                "dst",
                "w",
                (
                    F.col("w").cast("double")
                    / (F.col("__da") + F.col("__db") - F.col("w")).cast("double")
                ).alias("jaccard"),
            )
        )
    return pairs
