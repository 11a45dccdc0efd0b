"""Cross-execution determinism guard.

Round 4 found a bug this file exists to prevent recurring: minhash
signatures were built from a default-arg lambda, F.transform's arity
dispatch bound the hash salt to the element INDEX column, and the salt
string embedded a plan-unique variable name — so results were
self-consistent within one execution but CHANGED between executions (the
second run of a session reproducibly lost LSH candidate pairs).

Every query whose plan is assembled from generated expressions (lambda
factories, seeded constants, embedded literals) is executed TWICE here,
with the plan REBUILT between runs, and the full result multisets must be
identical. A plan-build-dependent expression cannot pass this twice.
"""

from __future__ import annotations

import pytest

# Full-gate tier: this whole module is heavyweight (plan-rebuild / partitioning invariance sweeps, ~1.5 min).
# The per-commit smoke tier deselects it: pytest -m "not slow".
# The FULL suite (no -m) remains the green gate for every round.
pytestmark = pytest.mark.slow

from epss_spark import registry

SF = "/root/testdata/sf0.001"

# The generated-expression families: per-permutation minhash lambdas,
# seeded LSH hyperplanes, IVF centroid fetch + assignment, simhash bit
# folds, winnowing's vectorized kernel, the multimodal digest fold, and
# hash-threshold sampling. Relational queries are static plans and are
# covered by the oracle differential instead.
GENERATED = [
    "dedup_minhash",
    "dedup_minhash_keep",
    # iterative min-label propagation: must converge to the same labels
    # on every rebuild/execution regardless of partition layout
    "dedup_cc_components",
    "dedup_cc_keep",
    "dedup_simhash",
    "dedup_embedding",
    "ann_lsh_bucketed",
    "ann_ivf",
    "text_winnow_fingerprint",
    "multimodal_features",
    "sample_stratified",
    "text_repetition",
    # round-6 generated-expression queries: BM25's eager-literal stats +
    # per-term filter lambdas, RRF's derived ranks over two generated
    # rankings, salted shard/position hashes, per-stratum budget literals
    # consumed in hash order, and the pack-order array sort
    "search_bm25",
    "search_hybrid_rrf",
    "sample_train_shards",
    "sample_token_budget",
    "pack_materialize",
    # PQ: sampled-codebook collect + per-subspace argmin lambdas + ADC
    # lookup expressions; DSIR top-k: md5-Gumbel keys over a float avg
    "ann_pq_topk",
    "sample_dsir_topk",
    # Bloom contamination: collect-derived literal bit array + per-element
    # membership lambdas must rebuild identically
    "dedup_contamination_bloom",
    # IVF-PQ: two sampled-centroid collects + probe/encode/ADC lambdas
    "ann_ivfpq_topk",
    # round-7 generated-expression queries: BPE's driver-loop of eager
    # top-pair fetches embedded as replace literals (train AND the
    # train-then-apply composite), the indexed BM25's eager df/N/avgdl
    # literals, span dedup's per-position slice lambdas, q-digest's
    # eager threshold + per-round checkpointed compression, SimHash
    # pair banding's per-block structs, and the bucketed budget's
    # prefix-offset join
    "text_bpe_vocab",
    "text_bpe_segment",
    "search_bm25_indexed",
    "dedup_spans",
    "dedup_spans_incremental",
    "agg_qdigest_quantiles",
    "dedup_simhash_pairs",
    "sample_token_budget_bucketed",
]


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", GENERATED)
def test_rebuilt_plan_gives_identical_results(name, spark):
    registry.load_all()
    fn = registry.get_all_queries()[name]
    first = _multiset(fn(spark, SF))   # plan build #1, execution #1
    second = _multiset(fn(spark, SF))  # plan REBUILT, execution #2
    assert first == second, f"{name}: results changed between executions"
    assert len(first) > 0, f"{name}: empty result defeats the check"


# Order/partitioning-sensitive shapes: collect_list buckets, windows with
# tiebreaks, hash-threshold filters. Results must not depend on the
# physical shuffle layout — at cluster scale the partition count is never
# what it was in the test environment.
LAYOUT_SENSITIVE = [
    "dedup_minhash",
    "dedup_simhash",
    "join_asof",
    "sample_stratified",
    # the 6-dp-rounded avg of per-feature log-ratios must not wobble with
    # the partial-aggregation order of the underlying double sum
    "sample_dsir",
    # first-occurrence min(struct) aggregates + coverage distinct must
    # not depend on which partition sees an occurrence first
    "dedup_spans",
    # q-digest node table: eager per-round checkpoints re-partition the
    # bounded frame, which must not perturb family grouping
    "agg_qdigest_quantiles",
]


@pytest.mark.parametrize("name", LAYOUT_SENSITIVE)
def test_results_invariant_to_shuffle_partitioning(name, spark):
    registry.load_all()
    fn = registry.get_all_queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        few = _multiset(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = _multiset(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert few == many, f"{name}: results depend on shuffle partitioning"
