"""Dedup / similarity / text operators on constructed fixtures with known
answers (the testdata documents have no near-dups, so injected fixtures are
the real semantic test; the oracle sweep covers engine parity separately).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epss_spark.operators import dedup, similarity, text
from epss_spark.operators.asof import asof_join

DOC = "the quick brown fox jumps over the lazy dog and runs far away today"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, DOC),
        (1, DOC),  # exact dup of 0
        (2, DOC.replace("quick", "QUICK!!")),  # normalizes to an exact dup
        (3, DOC.replace("lazy", "sleepy")),  # near-dup (1 token differs)
        (4, "completely different content about spark query engines at scale"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize():
    pass  # normalization is pinned via the oracle sweep (text_fingerprint)


def test_exact_groups(docs):
    got = {r.keep_doc_id: r.n_dups for r in dedup.exact_groups(docs).collect()}
    assert got[0] == 3  # docs 0,1,2 collapse to one fingerprint
    assert got[3] == 1 and got[4] == 1 and got[5] == 1


def test_ngram_jaccard_pairs(docs):
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    pairs = {(r.a_id, r.b_id): r.jaccard for r in out}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0
    assert (0, 3) in pairs and 0.3 <= pairs[(0, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(docs):
    out = dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    pairs = {(r.a_id, r.b_id) for r in out}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    # identical docs always share every band; the near-dup pair may or may
    # not be a candidate (probabilistic) but must never be a false positive
    for a, b in pairs:
        assert {a, b} <= {0, 1, 2, 3}


def test_simhash_identical_docs_same_fp(spark, docs):
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert fp[0] == fp[1] == fp[2]
    assert fp[0] != fp[4]
    # near-dup should be within small hamming distance
    ham = bin(fp[0] ^ fp[3]).count("1")
    assert ham <= 8


def test_winnow_shared_fingerprints(spark, docs):
    out = text.winnow_fingerprints(docs).groupBy("doc_id").agg(
        F.collect_set("fp").alias("fps")
    )
    fps = {r.doc_id: set(r.fps) for r in out.collect()}
    assert fps[0] == fps[1]  # identical docs -> identical fingerprint sets
    inter = len(fps[0] & fps[3]) / len(fps[0] | fps[3])
    assert inter > 0.4  # near-dups share most fingerprints
    assert len(fps[0] & fps[4]) == 0


def test_cosine_topk_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # identical to 0
        (2, [0.9, 0.1, 0.0, 0.0]),  # close
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb.filter(F.col("vec_id") == 0), emb, k=4).collect()
    ranked = [r.cand_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2, 3, 4]
    by_cand = {r.cand_id: r.cos for r in out}
    assert by_cand[1] == 1.0 and by_cand[4] == -1.0 and by_cand[3] == 0.0


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 6, 60.0)], "k long, t long, v double"
    )
    out = asof_join(left, right, key="k", left_time="t", right_values=["v"])
    got = {r.tag: r.v for r in out.collect()}
    assert got["a"] == 100.0  # equal timestamps included (>= semantics)
    assert got["b"] == 150.0  # latest at-or-before
    assert got["c"] is None  # nothing at-or-before -> null
