"""Crawl-ingestion tier — what runs BEFORE corpus_pipeline.py.

A web-scale training pipeline does not receive a clean `documents` table;
it receives raw markup, re-fetched URLs, and full periodic re-dumps. This
example chains the ingestion operators that turn that into the clean,
compacted, monitored corpus the rest of the engine consumes:

    strip_html (markup -> text, RE2-safe Catalyst chain)
    -> url_canonicalize + keep_latest (newest snapshot per canonical URL)
    -> snapshot_history (SCD-2 audit runs next to the serving view)
    -> snapshot_diff vs the previous dump (added/changed/removed only)
    -> quality_funnel (per-gate retention, one corpus pass)
    -> token_divergence (per-slice drift vs the pooled corpus)

Everything except the bounded funnel/divergence count tables is lazy;
text never crosses to Python anywhere.

Usage: python examples/crawl_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import dedup, prep, text  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("crawl-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # --- synthesize a messy crawl: every doc arrives as markup, under a
    # messy URL (mixed case, default port, tracking params), re-fetched
    # several times (97 pages share each canonical URL here), each fetch
    # with a version counter.
    page = (F.col("doc_id") % 97).cast("string")
    crawl = docs.select(
        F.concat(
            F.lit("HTTPS://Example.COM:443/page/"), page,
            F.lit("?utm_source=feed&id="), page,
        ).alias("url"),
        F.col("doc_id").alias("fetch_seq"),
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.lit("<html><body><!-- crawler --><h1>"), F.col("source"),
            F.lit("</h1><p>"), F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p><script>track()</script></body></html>"),
        ).alias("raw_html"),
    )
    print(f"raw fetches: {crawl.count()}")

    # 1. markup -> text at ingest (map-only; zero shuffle)
    crawl = crawl.withColumn("text", text.strip_html("raw_html")).drop("raw_html")

    # 2. canonical-URL compaction: newest fetch per canonical page —
    #    ONE aggregate shuffle, no window, no join-back
    crawl = crawl.withColumn("url", text.url_canonicalize("url"))
    latest = dedup.keep_latest(crawl, "url", "fetch_seq", tiebreak_col="doc_id")
    print(f"after keep_latest per canonical URL: {latest.count()}")

    # 2b. SCD-2 history NEXT TO the serving view: one row per
    #     unchanged-content run of each page ("when did this page last
    #     change, how long did each revision live?") — same single key
    #     exchange as the keep rule, half-open [valid_from, valid_to)
    hist = dedup.snapshot_history(
        crawl.withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit("")))),
        "url", "fetch_seq", "fp", tiebreak_col="doc_id",
    )
    n_runs = hist.count()
    n_open = hist.filter(F.col("valid_to").isNull()).count()
    print(f"SCD-2 history: {n_runs} content runs ({n_open} open)")

    # 3. diff against the "previous dump" (here: the same corpus minus a
    #    slice, so some pages read as added/changed) — downstream stages
    #    run on the differences, not the whole dump
    prev = latest.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" draft")).otherwise(F.lit("")),
        ),
    )
    diff = dedup.snapshot_diff(prev, latest, id_col="url")
    diff_counts = {r.status: r.cnt for r in
                   diff.groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    print(f"snapshot diff vs previous dump: {diff_counts}")

    # 4. quality funnel on the compacted corpus: which gate eats what —
    #    one corpus pass regardless of gate count
    base = latest.select("*", text.tokens("text").alias("__toks"))
    mean_wl = F.length(F.concat_ws("", F.col("__toks"))).cast("double") / F.greatest(
        F.size("__toks"), F.lit(1)
    )
    funnel = prep.quality_funnel(
        base,
        [
            ("min_tokens", F.size("__toks") >= 20),
            ("mean_word_len", (mean_wl >= 3) & (mean_wl <= 10)),
            ("lang_known", F.col("lang").isNotNull()),
        ],
    )
    print("quality funnel:")
    for r in funnel.collect():
        print(f"  {r.stage}. {r.name:<15} in={r.n_in:<6} out={r.n_out:<6} "
              f"retention={r.retention}")

    # 5. drift monitor: per-language divergence from the pooled corpus —
    #    a slice whose JS jumps between crawls has shifted content
    print("token divergence by lang (KL / JS vs pooled corpus):")
    for r in text.token_divergence(latest).orderBy("lang").collect():
        print(f"  {r.lang}: n_tokens={r.n_tokens:<8} kl={r.kl:<9} js={r.js}")

    spark.stop()


if __name__ == "__main__":
    main()
