"""Journey analysis + pipeline monitoring tier (round-9 operators).

What a product/data-quality team runs weekly over the events and
documents tables, batch and streaming side by side:

    event_transitions   -> where users go after each step (Markov table)
    session_paths       -> the whole-journey top-paths rollup
    daily_burst_zscore  -> volume anomalies vs a trailing baseline
    burst_stream        -> the same monitor maintained incrementally,
                           snapshot == batch pinned here at run time
    pr_curve            -> picking a quality-gate threshold with eyes open
    freq_spectrum       -> hapax/Zipf shape of the corpus
    pmi_bigrams         -> collocations worth protecting from chunkers

Usage: python examples/journey_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import sessionize as sz  # noqa: E402
from epss_spark.operators import text as text_ops  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402
from epss_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("journey-monitoring")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    print("top transitions (what follows each event type):")
    tr = sz.event_transitions(ev)
    for r in tr.orderBy(F.col("n").desc()).limit(5).collect():
        print(f"  {r.from_type:>9} -> {r.to_type:<9} n={r.n:<7} p={r.prob}")

    print("top session journeys (1h gap):")
    paths = sz.session_paths(ev, gap_seconds=3600)
    for r in paths.orderBy(F.col("n_sessions").desc()).limit(5).collect():
        print(f"  {r.n_sessions:>6} sessions  {r.path}")

    print("top 3-step motifs (in-session n-grams — funnel discovery):")
    for r in (
        sz.path_ngrams(ev, n=3, gap_seconds=3600)
        .orderBy(F.col("n").desc(), "gram")
        .limit(5)
        .collect()
    ):
        print(f"  {r.n:>6} occurrences in {r.n_sessions:>6} sessions  {r.gram}")

    # the transition table as a stream: split the log into three
    # TIME-PARTITIONED batches (the ordering contract) — carried per-key
    # last events stitch the boundary pairs, so the snapshot must equal
    # the one-shot table
    from epss_spark.streaming import transitions_stream

    with tempfile.TemporaryDirectory() as td:
        state = os.path.join(td, "tstate")
        rows = ev.orderBy("ts", "event_id").collect()
        k = len(rows)
        for epoch in range(3):
            b = rows[epoch * k // 3:(epoch + 1) * k // 3]
            transitions_stream.process_transitions_batch(
                spark.createDataFrame(b, ev.schema), epoch, state
            )
        snap = transitions_stream.transitions_snapshot(spark, state)
        same = sorted(map(tuple, snap.collect())) == sorted(map(tuple, tr.collect()))
        print(f"streaming transition snapshot == batch table (boundary stitching): {same}")

    print("volume bursts (trailing 7-day z >= 3):")
    z = sz.daily_burst_zscore(ev)
    bursts = z.filter("is_burst").orderBy("event_type", "day").collect()
    if bursts:
        for r in bursts[:5]:
            print(f"  {r.event_type} {r.day}: n={r.n} z={r.z}")
    else:
        hi = z.filter(F.col("z").isNotNull()).orderBy(F.col("z").desc()).first()
        print(f"  none (max z={hi.z} on {hi.event_type} {hi.day})")

    # the same monitor as a stream: replay the events in arbitrary order
    # across 3 micro-batches — counts are additive, so the snapshot must
    # equal the batch monitor regardless of arrival order
    from epss_spark.streaming import burst_stream

    with tempfile.TemporaryDirectory() as td:
        state = os.path.join(td, "counts")
        rows = ev.collect()
        for epoch in range(3):
            burst_stream.process_burst_batch(
                spark.createDataFrame(rows[epoch::3], ev.schema), epoch, state
            )
        snap = burst_stream.burst_snapshot(spark, state)
        same = sorted(map(tuple, snap.collect())) == sorted(map(tuple, z.collect()))
        print(f"streaming burst snapshot == batch monitor (out-of-order replay): {same}")

    print("PR sweep for an 'is English' stopword-fraction gate:")
    toked = docs.select(
        (F.col("lang") == "en").alias("label"),
        text_ops.tokens("text").alias("__toks"),
    )
    n_tok = F.size("__toks")
    n_stop = F.size(F.filter("__toks", lambda x: x.isin(*text_ops.STOPWORDS_EN)))
    scored = toked.select(
        "label",
        F.floor(F.lit(1e6) * n_stop.cast("double") / F.greatest(n_tok, F.lit(1)))
        .cast("long").alias("score"),
    )
    curve = text_ops.pr_curve(scored)
    best = curve.orderBy(F.col("f1").desc(), F.col("score").desc()).first()
    print(f"  best F1={best.f1} at threshold {best.score} "
          f"(prec={best.prec} rec={best.rec})")

    print("corpus shape (frequency spectrum, lowest and highest bands):")
    spec = text_ops.freq_spectrum(docs).orderBy("freq").collect()
    for r in spec[:2] + spec[-2:]:
        print(f"  freq={r.freq:<6} types={r.n_types:<7} tokens={r.n_tokens}")

    print("top collocations by PMI (count >= 5):")
    pmi = text_ops.pmi_bigrams(docs, min_count=5)
    for r in pmi.orderBy(F.col("pmi").desc(), "w1", "w2").limit(5).collect():
        print(f"  pmi={r.pmi:<9} n={r.n_pair:<5} {r.w1} {r.w2}")

    spark.stop()


if __name__ == "__main__":
    main()
