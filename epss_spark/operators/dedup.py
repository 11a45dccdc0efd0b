"""Deduplication operators for training-data pipelines.

Scale design notes (the point of each algorithm, not just its output):

- exact_groups: hash-groupBy on a fingerprint — one shuffle of (fp, id)
  pairs, never the full text. At 100 TB the shuffle payload is ~40 bytes/doc.
- minhash_lsh_pairs: shingle -> k minhashes -> banding -> bucket join.
  The candidate join is on band_key (a hash) — uniformly distributed, so no
  skew; cost is O(candidate pairs), not O(n^2).
- ngram_jaccard_pairs: exact Jaccard via a shingle-equality self-join with
  map-side distinct. Quadratic only within identical-shingle groups; used as
  the verifier behind LSH candidates (and standalone at moderate scale).
- simhash_groups: 1-shuffle near-dup clustering by a 32/64-bit majority-vote
  fingerprint of token hashes (xxhash64 JVM-side).

Hashes for the oracle-checked ops are md5 (identical across engines); simhash
uses Spark's native xxhash64 (JVM-vectorized, no cross-engine twin — checked
rows-only + by pytest golden fixtures).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epss_spark.operators.text import normalize, tokens, with_shingles


def exact_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5(normalized text) -> representative (min id)
    + duplicate count."""
    return (
        docs.select(F.md5(normalize(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _exploded_shingles(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from epss_spark.operators.layout import ensure_parallelism

    return (
        with_shingles(ensure_parallelism(docs), id_col, text_col)
        .select(id_col, F.explode("shingles").alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >= 1 shingle."""
    ex = _exploded_shingles(docs, id_col, text_col).cache()
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = ex.select(F.col(id_col).alias("a_id"), "sh")
    b = ex.select(F.col(id_col).alias("b_id"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    ex: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: for permutation h, min(md5('h|' || shingle)),
    plus the fused shingle-set size as `n_shingles`.

    Computed on the exploded (doc, shingle) set in ONE pass — num_hashes
    min-aggregates + the count over one shuffle, instead of num_hashes array
    traversals and a separate sizing pass.
    md5-as-permutation keeps the signature engine-portable (oracle parity).
    Pass a pre-built (cached) `ex` to share the shingle scan across stages.
    """
    if ex is None:
        ex = _exploded_shingles(docs, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("sh")))).alias(f"sig_{h}")
        for h in range(num_hashes)
    ]
    # fuse the shingle-set size into the same hash aggregation: callers that
    # need |shingles(doc)| (Jaccard verification) get it for free instead of
    # running a second groupBy over the exploded set
    aggs.append(F.count(F.lit(1)).alias("n_shingles"))
    return ex.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    prune_verification: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection, with exact-Jaccard
    verification of candidates. Returns (a_id, b_id, jaccard >= threshold).

    The exploded (doc, shingle) set feeds three consumers (signatures,
    verification join, sizes) — persist it once; regex-normalizing and
    re-shingling the corpus per consumer is the difference between one
    scan and six at 100 TB.
    """
    rows = num_hashes // bands
    ex_shared = _exploded_shingles(docs, id_col, text_col).persist()
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, ex=ex_shared).persist()
    band_cols = [
        F.md5(
            F.concat(F.lit(f"{b}|"), *[F.col(f"sig_{b * rows + r}") for r in range(rows)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select(id_col, F.col("e.b").alias("b"), F.col("e.band_key").alias("band_key"))
    # Candidate pairs per bucket via groupBy + in-bucket pair expansion
    # (nested array transform) instead of a self-join: one shuffle on
    # band_key, no duplicate scan of the banded side. Bucket pair counts
    # are quadratic in bucket size by definition of LSH; buckets are
    # hash-keyed so the groupBy has no skewed reducers.
    buckets = (
        melted.groupBy("b", "band_key")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform("ids", lambda y: F.struct(x.alias("a_id"), y.alias("b_id"))),
            )
        ),
        lambda p: p["a_id"] < p["b_id"],
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    if prune_verification:
        # candidates feed both the doc-pruning broadcast and the final
        # assembly — persist so the banding pipeline runs once, not twice
        cand = cand.persist()

    # verify candidates with exact Jaccard over the (shared) shingle sets.
    # Prune the verification self-join to candidate documents first: the
    # LSH banding already shrank the pair space, so intersections only need
    # computing among docs that appear in some candidate pair — at scale
    # this is the difference between a corpus-wide shingle self-join and a
    # join over a few thousand near-dup suspects.
    ex = ex_shared
    if prune_verification:
        cand_docs = (
            cand.select(F.col("a_id").alias(id_col))
            .unionByName(cand.select(F.col("b_id").alias(id_col)))
            .distinct()
        )
        ex_cand = ex.join(F.broadcast(cand_docs), id_col, "left_semi")
    else:
        ex_cand = ex
    # shingle-set sizes come fused out of the signature aggregation — no
    # second pass over the exploded set
    sizes = sig.select(id_col, F.col("n_shingles").alias("n"))
    a = ex_cand.select(F.col(id_col).alias("a_id"), "sh")
    b = ex_cand.select(F.col(id_col).alias("b_id"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        cand.join(inter, ["a_id", "b_id"], "left")
        .join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint: majority vote over token xxhash64 bits.

    Stays fully JVM-side: explode tokens -> one hash per token -> `bits`
    conditional-sum aggregates -> recombine. One shuffle on doc_id.
    """
    from epss_spark.operators.layout import ensure_parallelism

    tok = ensure_parallelism(docs).select(id_col, F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    bit_aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*bit_aggs)
    fp = reduce(
        lambda acc, i: acc + F.when(F.col(f"bit_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)),
        range(1, bits),
        F.when(F.col("bit_0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return per_doc.select(id_col, fp.cast("long").alias("simhash"))


def simhash_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Cluster docs by identical SimHash fingerprint (near-dup buckets)."""
    return (
        simhash(docs, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )
