"""Incremental near-dup dedup — the daily-append flow at 100 TB.

A crawl pipeline cannot re-run corpus-wide LSH every day. Instead:

  1. ONCE: build the LSH index over the accepted corpus
     (`minhash_index` -> band rows + shingle arrays, persisted; write the
     band rows bucketed by band_key so daily lookups join co-located).
  2. DAILY: `minhash_lookup(new_batch, index)` — bands the new docs only,
     broadcast-joins their band rows against the index scan (the corpus
     band rows never shuffle), and verifies candidates with exact
     Jaccard. Cost is O(append), not O(corpus); the indexed corpus never
     re-shingles.
  3. Drop new docs with a verified duplicate already in the corpus (or a
     smaller-id twin inside the batch), append survivors, and extend the
     index with THEIR band rows/shingles.

Equivalence with full recomputation is pinned by
tests/test_operators_ext.py::test_minhash_incremental_lookup_matches_full_recompute.

Usage: python examples/incremental_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import dedup  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402
from epss_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    # simulate yesterday's corpus and today's crawl batch
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    # 1. one-time index build (in production: write both frames to parquet,
    #    band rows bucketed by band_key via layout.write_bucketed).
    #    shingle_cache scopes the corpus shingle frame to this block —
    #    the index build and every lookup in the block share ONE persisted
    #    normalize/shingle scan, released deterministically on exit.
    with dedup.shingle_cache(corpus) as corpus_shmap:
        index_bands, index_shingles = dedup.minhash_index(corpus, shmap=corpus_shmap)
        index_bands = index_bands.persist()

        # 2. daily lookup: verified pairs touching the batch only
        with dedup.shingle_cache(batch) as batch_shmap:
            pairs = dedup.minhash_lookup(
                batch, index_bands, index_shingles, threshold=0.5, new_shmap=batch_shmap
            )

            # 3. the batch-side ACTION: a new doc is dropped if it has ANY
            #    verified duplicate in the corpus (the accepted copy wins
            #    regardless of id order), or a smaller-id twin inside the
            #    batch — dedup.drop_batch_duplicates implements exactly this
            kept = dedup.drop_batch_duplicates(batch, pairs)

            # actions run INSIDE the cache scopes
            n_batch, n_pairs, n_kept = batch.count(), pairs.count(), kept.count()
    print(f"batch: {n_batch}")
    print(f"verified pairs touching the batch: {n_pairs}")
    print(f"kept after incremental dedup: {n_kept}")
    index_bands.unpersist()

    # 4. the other incremental indexes run the same O(batch) night:
    #    line fingerprints strip seen boilerplate lines, span-gram
    #    fingerprints remove duplicated >= k-token spans (in production
    #    both indexes live bucketed on parquet and get the batch's
    #    new_fps appended — see DEPLOYMENT.md's layout table)
    line_kept, _line_fps = dedup.dedup_batch_lines(batch, dedup.line_index(corpus))
    span_kept, _span_fps = dedup.dedup_batch_spans(batch, dedup.span_index(corpus))
    print(f"batch docs surviving line-grain dedup: {line_kept.count()}")
    print(f"batch docs surviving span-grain dedup: {span_kept.count()}")


if __name__ == "__main__":
    main()
