"""End-to-end training-corpus preparation — the 100 TB pipeline in miniature.

Chains the engine's LLM-data operators over the testdata `documents` table:

    line dedup (CCNet) -> span dedup (Lee et al. 2022) -> quality gate
    -> per-domain cap -> exact dedup
    -> near-dup dedup (MinHash-LSH + verify) -> benchmark decontamination
    -> DSIR importance selection -> per-source sampling
    -> train/val/test split -> PII redaction
    -> sequence packing (fixed token budget) -> BPE vocab on the result

Every stage is a lazy DataFrame transformation; the whole pipeline is ONE
Spark plan per action. At cluster scale the corpus side never shuffles for
the contamination join (benchmark shingles broadcast); the near-dup
action's drop-set anti-join is left to AQE (broadcast while small,
shuffled on a high-duplication corpus); the only corpus-wide exchanges
are the LSH bucket groupBy and the final write.

Usage: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import dedup, prep, selection, text  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 0. line-level dedup first (CCNet order): strip crawl boilerplate —
    #    repeated banners/menus/footers — BEFORE any doc-level signal is
    #    computed, so quality and near-dup stats see real content.
    #    preserve_other_columns keeps source/lang for the later stages.
    docs = dedup.dedup_corpus_lines(docs, preserve_other_columns=True).drop(
        "n_lines_kept"
    )
    print(f"after line dedup: {docs.count()}")

    # 0b. exact substring-span dedup (Lee et al. 2022): remove duplicated
    #     >= 8-token spans line dedup can't see (paragraphs re-quoted
    #     mid-document, license blocks reflowed across line boundaries).
    #     Keeps the documents; rewrites text to the surviving token
    #     stream.
    docs = dedup.dedup_spans(docs, k=8, preserve_other_columns=True).drop(
        "n_tokens_kept"
    )
    print(f"after span dedup: {docs.count()}")

    # 1. quality gates, cheapest-first: C4 line-grain structure (word
    #    floor, banned markers; terminal-punct relaxed — the synthetic
    #    corpus is unpunctuated single-line prose), then the Gopher
    #    signal report's composite verdict, then the token-statistic
    #    gate. All three are zero-shuffle codegen passes.
    structured = docs.join(
        text.c4_line_filter(
            docs.select("doc_id", "text"), min_words_per_line=3, min_lines=1,
            require_terminal_punct=False,
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"after C4 line filter: {structured.count()}")
    gq = text.gopher_quality_report(structured, min_words=20)
    structured = structured.join(
        gq.filter(F.col("passes")).select("doc_id"), "doc_id", "left_semi"
    )
    print(f"after Gopher gate: {structured.count()}")
    gated = text.quality_filter(structured)
    print(f"after quality gate: {gated.count()}")

    # 1b. hard per-domain cap: no source may dominate the mix
    gated = dedup.cap_per_stratum(gated, n_max=100)
    print(f"after per-domain cap: {gated.count()}")

    # 2. exact dedup: keep the min-id representative per normalized text
    exact = dedup.dedup_corpus(gated)
    print(f"after exact dedup: {exact.count()}")

    # 3-6 run inside ONE shingle-cache scope: every later action's plan
    # embeds the near-dup pipeline, so the cache must stay alive until the
    # last action (releasing it early would re-run shingling per action).
    with dedup.shingle_cache(exact) as shmap:
        # 3. near-dup dedup: MinHash-LSH candidates, exact-Jaccard
        #    verified, greedy keep-lowest-id
        pairs = dedup.minhash_lsh_pairs(exact, shmap=shmap, threshold=0.5)
        # the deduped corpus feeds three more stages — persist the small
        # survivor set rather than re-verifying LSH pairs per action
        neared = dedup.dedup_corpus_near(exact, pairs).persist()
        try:
            print(f"after near-dup dedup: {neared.count()}")

            # 4. decontamination: drop anything overlapping the "benchmark"
            #    set (here: docs 0-9 stand in for an eval suite)
            bench = docs.filter(F.col("doc_id") < 10)
            contam = dedup.benchmark_contamination(neared, bench)
            clean = neared.join(
                contam.filter(F.col("contamination_frac") >= 0.5).select("doc_id"),
                "doc_id",
                "left_anti",
            )
            print(f"after decontamination: {clean.count()}")

            # 4a. span-excision decontamination for the docs that SURVIVED
            #     the drop rule: any >= 8-token span still shared with the
            #     benchmark is edited out (the GPT-3 13-gram rule as an
            #     edit, not a drop) — survivors keep their clean majority
            clean = dedup.decontaminate_spans(clean, bench, k=8).join(
                clean.drop("text"), "doc_id"
            ).drop("n_tokens_kept")
            print(f"after span-excision decontamination: {clean.count()}")

            # 4b (round-10). near-dup decontamination: paraphrase-level
            #     benchmark overlap that BOTH rules above miss (no exact
            #     fingerprint, no verbatim >=8-token span) — asymmetric
            #     LSH join: the corpus's band rows equi-join the
            #     benchmark's broadcast bands; in-corpus near-dups were
            #     already the near-dup stage's business and stay put
            # the surviving set is small and feeds every remaining
            # stage — persist it so the span-excision lineage (tokenize
            # + k-gram joins) is not re-executed per downstream action
            clean = dedup.decontaminate_near(clean, bench).persist()
            print(f"after near-dup decontamination: {clean.count()}")

            # 4b' (round-11). the audit artifact a dataset card cites:
            #     per-benchmark residual contamination AFTER the ladder
            #     ran — every (benchmark, method) row should now read 0
            #     for exact/near (spans can stay nonzero: the span rule
            #     EDITS leaks shorter than a whole doc, it does not
            #     re-check the residue). One broadcast-sided plan, no
            #     corpus-grain shuffle.
            audit = dedup.contamination_report(
                clean, bench.withColumn("benchmark", F.lit("holdout")), k=8
            )
            for r in audit.orderBy("benchmark", "method").collect():
                print(
                    f"  audit {r.benchmark}/{r.method}: "
                    f"{r.n_contaminated} docs ({r.rate})"
                )

            # 4c. DSIR importance selection: score every surviving doc
            #     against a target-domain sample (here: the corpus's own
            #     English subset stands in for a trusted quality set) and
            #     keep a Gumbel-top-k importance sample. The weight model
            #     is two bounded stats jobs; scoring is a zero-shuffle
            #     projection (plan-pinned).
            picked = selection.dsir_sample(
                clean, k=250, n_buckets=512, target_pred=F.col("lang") == "en"
            )
            clean = clean.join(picked.select("doc_id"), "doc_id", "left_semi")
            print(f"after DSIR selection (k=250): {clean.count()}")

            # 5. corpus mixing: deterministic per-source rates (stable
            #    under appends)
            mixed = dedup.sample_stratified(
                clean, {"src0": 1.0, "src1": 0.5}, default_rate=0.25
            )
            print(f"after per-source sampling: {mixed.count()}")

            # 5b. temperature-scaled token budgets (UniMax alpha rule):
            #     derive per-source quotas from the surviving mix's own
            #     token counts, then enforce them deterministically
            budgets = {
                r[0]: int(r.budget)
                for r in dedup.mix_temperature_budgets(
                    mixed, total_tokens=20_000, alpha=0.7
                ).collect()
            }
            mixed = dedup.sample_token_budget(mixed, budgets)
            print(f"after temperature-budget mix (20k tokens @ a=0.7): {mixed.count()}")

            # 6. train/val/test split — LEAKAGE-SAFE (round-10): hash the
            #    near-dup component representative (reusing the LSH pairs
            #    from stage 3), so no eval doc is a near-duplicate of a
            #    training doc; docs untouched by any pair split exactly as
            #    the plain train_split would. NOTE: this pipeline already
            #    hard-deduped near-dups (stage 3 keeps one per component),
            #    so every survivor is a singleton here — the grouped path
            #    earns its keep in pipelines that deliberately RETAIN
            #    near-dups for diversity and still need clean eval splits
            split = dedup.train_split_leakage_safe(
                mixed, pairs, weights=(0.8, 0.1, 0.1)
            )
            n_grouped = split.filter(F.col("split_group") != F.col("doc_id")).count()
            print(f"  split by component ({n_grouped} docs ride a group rep):")
            for row in split.groupBy("split").count().orderBy("split").collect():
                print(f"  {row['split']}: {row['count']}")
            split = split.drop("split_group")

            # 7. tokenizer-facing prep on the train split: PII scrub
            #    (zero-shuffle projection), then pack into fixed-budget
            #    training sequences (only integer columns cross to Python)
            train = split.filter(F.col("split") == "train")
            scrubbed = prep.pii_redact(train)
            n_pii = scrubbed.select(
                F.sum(
                    F.col("n_email") + F.col("n_ssn") + F.col("n_phone") + F.col("n_ipv4")
                ).alias("n")
            ).first()["n"]
            print(f"PII spans redacted in train split: {n_pii}")
            packed = prep.pack_sequences(train, budget=128, n_buckets=8)
            stats = prep.pack_stats(packed, budget=128)
            agg = stats.agg(
                F.count("*").alias("n_seqs"),
                F.avg("fill_frac").alias("avg_fill"),
            ).first()
            print(
                f"packed into {agg['n_seqs']} sequences of <=128 tokens "
                f"(avg fill {agg['avg_fill']:.0%})"
            )

            # 8. materialize the sequences (texts concatenated in pack
            #    order) and shard them deterministically for training
            seqs = prep.materialize_sequences(packed, train).withColumn(
                "seq_id", F.col("bucket") * 1000000 + F.col("bin")
            )
            sharded = dedup.train_shards(seqs, n_shards=4, id_col="seq_id")
            n_per_shard = sharded.groupBy("shard").count().orderBy("shard").collect()
            print(
                "training shards: "
                + ", ".join(f"{r['shard']}:{r['count']}" for r in n_per_shard)
            )

            # 9. train a BPE vocabulary ON the final train split — the
            #    merge table is the tokenizer artifact that ships with the
            #    shards (one corpus pass + bounded merge rounds)
            merges = text.bpe_merges(train, n_merges=8)
            top = ", ".join(f"{r.lhs}+{r.rhs}" for r in merges.collect()[:5])
            print(f"BPE merge table (first 5 of 8): {top}")
        finally:
            neared.unpersist()


if __name__ == "__main__":
    main()
