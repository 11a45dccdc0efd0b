"""Term-based retrieval over document corpora — the lexical complement to
the embedding ANN operators (operators/similarity.py). A training-data
pipeline uses this for targeted corpus probes ("find the docs about X"),
quality audits, and hybrid (BM25 + dense) retrieval experiments.

Scale design: for a PLAN-TIME-CONSTANT query term list, every per-document
signal (document length, per-term term frequency) is a pure codegen
projection over one pass of the text — no explode, no corpus shuffle. The
corpus-level statistics BM25 needs (N, avgdl, per-term document frequency)
all come out of ONE single-row global aggregate, which is then
broadcast-joined back. The only exchanges in the whole plan are that
1-row SinglePartition aggregate and its broadcast; the top-k is a
TakeOrderedAndProject (no global sort). Pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epss_spark.operators.text import tokens


def _eq(term: str):
    # single-arg lambda FACTORY: F.filter dispatches on lambda arity, so a
    # default-arg closure (`lambda x, t=term:`) would be called as the
    # two-arg (element, index) form and silently compare against the index
    # (the minhash_signatures trap, operators/dedup.py).
    return lambda x: x == F.lit(term)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Uses the Lucene/ATIRE idf variant, which is non-negative for every
    document frequency: idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).
    Scores are rounded to 6 dp and ties break on ascending id, so the
    selected k and their order are deterministic across engines (same
    contract as similarity.cosine's dp rounding).

    Only documents matching at least one query term are candidates; with
    fewer than k matches, fewer than k rows return.

    Scale shape: term frequencies and document length are codegen
    projections (size/filter over one tokenize of the text — no explode,
    no per-term scan). Corpus stats (N, avgdl, df per term) are ONE
    global 1-row aggregate over those projections, broadcast back; the
    integer-only per-doc frame is persisted so the corpus text is
    tokenized once, not once per pass. Top-k plans as
    TakeOrderedAndProject. Zero hash-partitioned exchanges anywhere.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct (BM25 is a bag-of-terms sum)")
    base = docs.select(id_col, tokens(text_col).alias("__toks"))
    per_doc = base.select(
        id_col,
        F.size("__toks").alias("__dl"),
        *[
            F.size(F.filter("__toks", _eq(t))).alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # the int-only (id, dl, tf...) frame feeds two consumers (stats agg +
    # scoring); persist so the regex tokenize pipeline runs once. ~8 bytes
    # per column per doc — orders of magnitude smaller than the corpus.
    per_doc = per_doc.persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    norm = F.lit(k1) * (
        (F.lit(1.0) - F.lit(b))
        + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
        )
        # (k1 + 1) as a lit-plus-lit, not a Python-folded constant: the
        # oracle SQL spells `({k1} + 1.0)`, and mirroring the IEEE op
        # sequence keeps the 6-dp rounding bit-identical cross-engine
        term_score = idf * tf * (F.lit(k1) + F.lit(1.0)) / (tf + norm)
        score = term_score if score is None else score + term_score
    matched = reduce_or([F.col(f"__tf_{i}") > 0 for i in range(len(query_terms))])
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(matched)
        .select(id_col, F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def reduce_or(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of bounded candidate lists — the standard
    hybrid-retrieval combiner (lexical BM25 + dense ANN, or any mix):
    score(d) = sum over lists containing d of 1 / (k + rank_in_list(d)).
    Rank-based fusion needs no score calibration between retrievers,
    which is exactly why it is the default hybrid combiner.

    Each input must have exactly two columns: `id_col` and one score
    column (any name); ranks are derived as row_number over
    (score desc, id asc), so fusion is deterministic across engines.
    `rrf_score` is rounded to 6 dp; final ties break on ascending id.

    Scale shape: inputs are TOP-N candidate lists (tens to thousands of
    rows — the output of bm25_topk / cosine_topk), so the global
    rank window and the fusion groupBy run on bounded data by
    construction; this operator is deliberately NOT for ranking a whole
    corpus (rank the corpus with the retrievers' own distributed top-k
    first)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    ranked = []
    for df in rankings:
        others = [c for c in df.columns if c != id_col]
        if id_col not in df.columns or len(others) != 1:
            raise ValueError(
                f"each ranking needs exactly ({id_col}, <score>); got {df.columns}"
            )
        w = Window.orderBy(F.col(others[0]).desc(), F.col(id_col).asc())
        ranked.append(df.select(id_col, F.row_number().over(w).alias("__r")))
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("__r"))), 6).alias("rrf_score")
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(topk)
    )
