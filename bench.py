"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line.

Each query is forced with the noop sink (full computation, no driver
collect), timed end-to-end including plan + execution. The flagship metric
is the quantization pipeline's input-rows/sec, comparable to the reference's
~6.9M rows/s (BASELINE.md; NOTES.md:38-39 of the reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from epss_spark import registry
from epss_spark.session import get_spark, sf_dir

HEADLINE = [
    "window_lag_diff",  # the flagship quantization kernel
    "epss_quantize_daily",  # full EPSS lifecycle composite
    "agg_groupby",  # TPC-H Q1 shape hash agg
    "join_multi",  # star join + agg (broadcast dims)
    "window_range_frame",  # 30-day trailing window
    "topk",  # TakeOrderedAndProject
    "dedup_exact_docs",  # fingerprint dedup
    "dedup_minhash",  # MinHash LSH + verify
    "ann_cosine_topk",  # brute-force similarity baseline
    "text_stats",  # text quality scan
    "text_chunk",  # context-window fan-out (map-only, chunk explode)
    "pack_sequences",  # greedy packing (bucketed applyInPandas, int-only crossing)
    "dedup_lines",  # corpus-level line dedup (hash-agg first occurrence)
    "search_bm25",  # lexical retrieval (zero-shuffle, broadcast stats)
    "sample_dsir",  # DSIR selection (2 bounded stats jobs + zero-shuffle scoring)
    "ann_pq_topk",  # PQ ADC search (inline encode, broadcast queries)
    "dedup_spans",  # exact substring-span dedup (k-gram hash-agg + coverage)
    "search_bm25_indexed",  # times index BUILD + lookup (the registry query
    #                         constructs postings inline; the artifact-backed
    #                         lookup alone is plan-pinned tokenize-free and
    #                         is NOT what this number measures)
    # round 8 (headline now 20 queries; totals incomparable with r7 —
    # compare per-query, after checking calibration_sec):
    "dedup_spans_raw",  # offset-preserving span dedup (adds the offset
    #                     window + islands merge + raw-text excision on
    #                     top of dedup_spans' detection stage)
    "ann_ivfpq_rerank",  # two-stage ANN: ADC shortlist + exact re-rank
    # round 9 (headline now 22 queries; totals incomparable with r8 —
    # compare per-query via query_pairs, after checking calibration_sec):
    "event_funnel",  # ordered-sequence conversion funnel over the
    #                  hot-key-safe chunked prefix-fold (events tier's
    #                  first headline row)
    "dedup_url_history",  # SCD-2 interval compaction (lag + run-sum +
    #                       agg + lead in ONE key exchange)
    # round 10 (headline now 24 queries; totals incomparable with r9 —
    # compare per-query via query_pairs, after checking calibration_sec):
    "event_session_paths",  # full-sequence journey mining (window-sort
    #                         floor kernel; capped-by-default hot-key
    #                         guard rides the key exchange)
    "event_transitions",  # first-order Markov transition table (lead
    #                       window + bounded |types|^2 aggregate)
    # round 11 (headline now 25 queries; totals incomparable with r10 —
    # compare per-query via query_pairs, after checking calibration_sec):
    "event_path_ngrams",  # session-scoped motif mining (driver-surfaced
    #                       this round; two-stage aggregate rides the
    #                       sessionize key exchange, 0.34x-linear at 10x)
    # round 11 second addition (headline now 26 queries):
    "cluster_kmeans",  # deterministic Lloyd k-means training + stats
    #                    (2 exact-arithmetic updates + final assignment:
    #                    3 codegen corpus scans, one k-row aggregate each,
    #                    zero corpus-grain shuffle)
    # round 14 (headline now 27 queries; totals incomparable with r13 —
    # compare per-query via query_pairs, after checking calibration_sec):
    "classify_linear_quality",  # supervised tier: hashed featurize (two
    #                             bounded exchanges, persisted) + 10
    #                             single-aggregate GD epochs + map-only
    #                             scoring — the trained-model analogue
    #                             of cluster_kmeans's bench row
]

# Headline workload scale-up (PERF.md bench protocol, round 5): sf0.1
# queries run 0.1-1.5 s, inside the machine's ±20% noise band — so the
# HEADLINE loop runs against a key-shifted replicated copy of the tables,
# sized so each query does seconds of real work and run-to-run deltas are
# signal. Built once into .scratch (idempotent, excluded from timing).
# Factors are per-table so shared tables stay join-consistent.
WORKLOAD_SCALE = {
    "events": 128,  # 12.8M rows under the window kernels
    "lineitem": 16,  # 9.6M-row Q1 scan / Q5-shape fact side
    "orders": 16,  # orderkey shifted in lockstep with lineitem
    "documents": 4,  # 20k docs; texts token-salted per replica so
    #                  cross-replica copies are NOT near-dups (would
    #                  quadratically inflate LSH candidate pairs)
    "embeddings": 16,  # 32k candidates; query side (vec_id < 5) unshifted
}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_scaled_workload(spark, target: str) -> str:
    """Materialize the replicated bench tables for `target` under .scratch.
    Keys are shifted per replica (window/groupBy cardinality scales with the
    data, as it would at a real larger SF); unscaled tables are symlinked.
    Returns the scaled directory path."""
    import datetime as _dt  # noqa: F401  (kept local: builder only)

    from pyspark.sql import functions as F

    from epss_spark.tables import load_table

    import hashlib

    # key the cache on the ABSOLUTE path plus a fingerprint of the source
    # files (relpath/size/mtime of every file under each *.parquet entry):
    # two different targets both named "sf0.1" must not share stale scaled
    # data, and REGENERATED testdata at the same path (driver reseeds, ts
    # format flips) must invalidate the scaled copy automatically instead
    # of silently reusing it (the basename stays for human readability)
    abspath = os.path.abspath(target)
    fp = hashlib.md5(abspath.encode())
    # the scale factors are part of the identity: tools/scale_probe.py
    # builds a 10x variant of this same workload, which must not collide
    # with (or silently reuse) the 1x bench directory
    fp.update(repr(sorted(WORKLOAD_SCALE.items())).encode())
    for entry in sorted(os.listdir(abspath)):
        if not entry.endswith(".parquet"):
            continue
        p = os.path.join(abspath, entry)
        files = [p]
        if os.path.isdir(p):
            files = sorted(
                os.path.join(dp, f) for dp, _, fs in os.walk(p) for f in fs
            )
        for f in files:
            st = os.stat(f)
            fp.update(
                f"{os.path.relpath(f, abspath)}|{st.st_size}|{st.st_mtime_ns}\n".encode()
            )
    tag = f"{os.path.basename(os.path.normpath(target))}_{fp.hexdigest()[:10]}"
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", f"bench_scaled_{tag}_v3"
    )
    marker = os.path.join(root, "_SUCCESS")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)

    def replicate(df, k, shifts, out_name):
        rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep")
        big = df.select("*", rep)
        for col, stride in shifts.items():
            big = big.withColumn(col, F.col(col) + F.col("__rep").cast("bigint") * stride)
        big = big.drop("__rep")
        if out_name == "documents":
            # salt every NORMALIZED token with an alphanumeric replica
            # suffix: each replica keeps the ORIGINAL corpus's near-dup
            # structure, but no shingle crosses replicas, so pair counts
            # scale linearly with k. Salting must happen AFTER the dedup
            # normalizer's transform ([^a-z0-9 ] -> space): salting raw
            # whitespace tokens leaves every non-final fragment of a
            # punctuated token ("a-b-c-dx2" -> tokens a,b,c,dx2) unsalted
            # and shared across replicas, and a non-alphanumeric salt
            # ("~r") normalizes away entirely — the round-5 scale probe
            # measured the resulting cross-replica cliques at 249M
            # candidate pairs.
            from epss_spark.operators.text import normalize

            big = df.select("*", rep)
            big = (
                big.withColumn("doc_id", F.col("doc_id") + F.col("__rep").cast("bigint") * 10_000_000)
                .withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(normalize(F.coalesce(F.col("text"), F.lit(""))), " "),
                            lambda w: F.concat(w, F.lit("x"), F.col("__rep").cast("string")),
                        ),
                    ),
                )
                .withColumn("n_chars", F.length("text"))
                .drop("__rep")
            )
        big.repartition(32).write.mode("overwrite").parquet(os.path.join(root, f"{out_name}.parquet"))

    for t in ALL_TABLES:
        out = os.path.join(root, f"{t}.parquet")
        k = WORKLOAD_SCALE.get(t, 1)
        if k == 1:
            if not os.path.lexists(out):
                os.symlink(os.path.join(os.path.abspath(target), f"{t}.parquet"), out)
            continue
        df = load_table(spark, target, t)
        shifts = {
            "events": {"user_id": 1_000_000, "event_id": 100_000_000},
            "lineitem": {"l_orderkey": 10_000_000},
            "orders": {"o_orderkey": 10_000_000},
            "documents": {},  # handled inside replicate (text salting)
            "embeddings": {"vec_id": 10_000_000},
        }[t]
        replicate(df, k, shifts, t)
    open(marker, "a").close()
    return root


def main() -> None:
    target = os.environ.get("SPARK_GRAFT_SF_DIR", sf_dir())
    spark = get_spark("epss-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    # Warm the JVM/codegen with one tiny-scale pass of representative
    # kernels (scan+window, shingle pipeline, vector math) so per-query
    # numbers measure steady-state execution, not first-job JIT/plan setup.
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = target
    for warm_q in ["topk", "window_lag_diff", "dedup_minhash", "ann_cosine_topk"]:
        force(registry.QUERIES[warm_q](spark, warm_sf))

    # The reference's own benchmark workload (BASELINE.md): quantize a dense
    # date-partitioned score matrix. Built once into .scratch (idempotent).
    # Measured FIRST, on a quiet JVM — running it after the headline loop
    # was worth ±25% of noise from accumulated shuffle files and GC debt.
    n_days, n_cves = 100, 100_000
    scores_root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", f"bench_scores_{n_days}x{n_cves}_1fpd"
    )
    if not os.path.exists(os.path.join(scores_root, "_SUCCESS")):
        from pyspark.sql import functions as F

        dense = (
            spark.range(n_cves)
            .withColumn("cve", F.concat(F.lit("CVE-2024-"), F.col("id")))
            .crossJoin(
                spark.range(n_days).select(
                    F.date_add(F.lit("2023-03-07").cast("date"), F.col("id").cast("int")).alias("date")
                )
            )
            # deterministic pseudo-scores; ~15% change day-over-day
            .withColumn("h", F.abs(F.xxhash64("cve", "date")) % 100)
            .withColumn(
                "epss",
                F.when(F.col("h") < 15, (F.abs(F.xxhash64("cve", "date", F.lit(1))) % 100000) / 100000.0)
                .otherwise((F.abs(F.xxhash64("cve")) % 100000) / 100000.0),
            )
            .withColumn("percentile", F.lit(0.5))
            .select("date", "cve", "epss", "percentile")
        )
        # one file per day (reference layout: 328 daily files, NOTES.md:38);
        # without the repartition each of 32 write tasks emits a sliver into
        # every date dir -> 3200 tiny files and a scan dominated by footer
        # reads instead of row decoding
        dense.repartition("date").write.mode("overwrite").partitionBy("date").parquet(scores_root)
        open(os.path.join(scores_root, "_SUCCESS"), "a").close()

    import datetime as dt

    from epss_spark.client import EPSSClient

    hi = dt.date(2023, 3, 7) + dt.timedelta(days=n_days - 1)
    client = EPSSClient(spark, scores_root, max_date_resolver=lambda: hi)
    # Parity workload: the reference's ~10s measures "load 328 parquet files
    # + drop unchanged" ONLY (reference NOTES.md:39) — no final sort, no
    # console render. sort=False is that exact workload.
    t0 = time.perf_counter()
    force(client.get_changed_scores("2023-03-08", hi, sort=False))
    epss_cold_sec = time.perf_counter() - t0
    # Pair protocol (round 7) + dispersion gate (round 8): the parity
    # number is what the 2x contract is judged on, so it gets the same
    # self-discounting evidence as the headline loop — two consecutive
    # min-of-2 rounds. When the pair disagrees beyond the ~10% band the
    # artifact landed in an unstable host window: a THIRD round runs and
    # the min stands, with every round recorded so the dispersion that
    # triggered the retry stays visible (same-code swings up to 1.8x
    # across host windows were most of the cross-round "regression"
    # noise before the gate).
    def _pair_gate(pair: list[float], run_round) -> list[float]:
        if min(pair) > 0 and max(pair) > 1.10 * min(pair):
            pair.append(run_round())
        return pair

    def _epss_round() -> float:
        round_min = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(client.get_changed_scores("2023-03-08", hi, sort=False))
            s = time.perf_counter() - t0  # steady state: I/O+JIT warmed
            round_min = s if round_min is None else min(round_min, s)
        return round(round_min, 4)

    # Warmup pair (round 14, the flagship-dispersion fix): ONE untimed
    # round between the cold run and the gated rounds. Evidence for why:
    # r12's four gated rounds read [1.646, 1.408, 1.395, 1.325] — the
    # floor keeps dropping through round 4 because JIT/page-cache warmup
    # extends past the cold run — while r13 drew only 3 rounds and its
    # floor (1.625) never reached the warm plateau, moving the artifact
    # 0.92x -> 1.12x on UNCHANGED code (VERDICT r13 item 1; PERF.md
    # round-14 adjudication). The warmup round burns that transient
    # before any gated round, so a 3-round artifact samples the plateau
    # the old round 4 reached; it is recorded (not hidden) so the
    # transient's size stays visible across rounds.
    epss_warmup_sec = _epss_round()
    # min-of-3 floor (round-10 judge item 1) — the 2x contract is judged
    # on this number, and its r10 pair drifted +10% on unchanged code
    epss_pair = _pair_gate([_epss_round() for _ in range(3)], _epss_round)
    epss_sec = min(epss_pair)
    # Full pipeline including the canonical (date asc, cve desc) output sort.
    epss_full_sec = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(client.get_changed_scores("2023-03-08", hi))
        s = time.perf_counter() - t0
        epss_full_sec = s if epss_full_sec is None else min(epss_full_sec, s)
    epss_rows = n_days * n_cves
    client.unpersist()

    # The engine's recommended REPEATED-quantization layout: cve-bucketed,
    # (cve, date)-sorted table. Bucketing satisfies the window's clustering
    # requirement, so the quantize plan has ZERO exchanges — the number
    # that matters when the same matrix is re-queried daily at 100 TB.
    # The in-memory catalog doesn't persist across runs, so the table is
    # rebuilt each bench run (build time excluded from the metric).
    from epss_spark.operators.layout import write_bucketed

    spark.sql("DROP TABLE IF EXISTS bench_scores_bucketed")
    write_bucketed(
        spark.read.parquet(scores_root).repartition(32, "cve"),
        "bench_scores_bucketed",
        "cve",
        num_buckets=32,
        sort_key=["cve", "date"],
        path=os.path.join(os.path.dirname(scores_root), "bench_scores_bucketed"),
    )
    bclient = EPSSClient(spark, table="bench_scores_bucketed", max_date_resolver=lambda: hi)
    force(bclient.get_changed_scores("2023-03-08", hi, sort=False))
    epss_bucketed_sec = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(bclient.get_changed_scores("2023-03-08", hi, sort=False))
        s = time.perf_counter() - t0
        epss_bucketed_sec = s if epss_bucketed_sec is None else min(epss_bucketed_sec, s)

    # Timing discipline (PERF.md bench protocol, round 5): headline queries
    # run against the SCALED workload (seconds of real work each, see
    # WORKLOAD_SCALE) so run-to-run deltas are signal. The first execution
    # of a query JIT-compiles its kernels (measured: dedup_minhash 11.6 s
    # cold -> 1.5 s steady) — a full warm-up round is discarded — and JVM
    # health drifts in windows (GC debt, shuffle-file pressure), so the
    # timed passes are round-robin with the per-query MIN, spreading each
    # query's samples across the session. clearCache between runs
    # (CacheManager matches by logical plan and would silently reuse
    # intermediates); a GC hint between passes drains debt outside the
    # timed regions.
    # Machine-speed calibration: a fixed pure-CPU kernel (no I/O, no
    # shuffle variance) timed min-of-3. Cross-invocation drift in THIS
    # number is host-level (hypervisor neighbors, CPU frequency) — divide
    # per-query times by (calibration / its historical ~baseline) to
    # separate host drift from real regressions.
    calib = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(4_000_000_000).selectExpr("sum(id % 97) AS s").collect()
        c = time.perf_counter() - t0
        calib = c if calib is None else min(calib, c)

    bench_dir = build_scaled_workload(spark, target)
    # 3 rounds x 2 passes, round-robin spread across the session. Each
    # round reports its own min-total: the consecutive same-process totals
    # are the protocol-v2 self-discounting evidence (PERF.md) — if
    # pair_totals disagree beyond the documented ~10% band, the artifact
    # landed in an unstable host window and its absolute numbers should be
    # read against calibration_sec. The floor is MIN-OF-3 per query
    # (round-10 judge item 1: at 2 entries nobody can tell cross-round
    # drift from noise — r10's +36% ann_cosine_topk reading came from a
    # 2-entry artifact; the dispersion gates below still add a 4th round
    # for any query or total that disagrees >10% across rounds).
    N_ROUNDS, PASSES_PER_ROUND = 3, 2
    query_rounds: dict[str, list[float]] = {}
    pair_totals: list[float] = []
    for name in HEADLINE:  # warm-up round: JIT + plan cache, discarded
        spark.catalog.clearCache()
        force(registry.QUERIES[name](spark, bench_dir))

    def _timed_query(name: str) -> float:
        spark.catalog.clearCache()
        # GC outside the timed region: collections triggered DURING
        # a multi-second query are the main cross-run variance source
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        force(registry.QUERIES[name](spark, bench_dir))
        return time.perf_counter() - t0

    def _headline_round() -> float:
        round_timings: dict[str, float] = {}
        for _ in range(PASSES_PER_ROUND):
            for name in HEADLINE:
                sec = _timed_query(name)
                round_timings[name] = min(round_timings.get(name, sec), sec)
        for k, v in round_timings.items():
            query_rounds.setdefault(k, []).append(round(v, 4))
        return round(sum(round_timings.values()), 4)

    for _ in range(N_ROUNDS):
        pair_totals.append(_headline_round())
    # dispersion gate (round 8): a >10% pair gap means an unstable host
    # window — one more round, per-query mins absorb it, rounds recorded
    _pair_gate(pair_totals, _headline_round)
    # per-query dispersion gate (round 9): the total-level gate can hide a
    # single query swinging while the rest cancel — exactly the noise that
    # produced round-8's false "join_multi regressed +16.6%" reading. Any
    # query whose per-round mins disagree beyond the same ~10% band gets a
    # targeted extra round; every round's value is recorded in the
    # artifact (query_pairs) so cross-round comparisons can see the
    # dispersion instead of trusting one number.
    def _single_query_round(name: str) -> float:
        best = None
        for _ in range(PASSES_PER_ROUND):
            sec = _timed_query(name)
            best = sec if best is None else min(best, sec)
        return round(best, 4)

    for name in HEADLINE:
        vals = query_rounds.get(name, [])
        if vals and min(vals) > 0 and max(vals) > 1.10 * min(vals):
            vals.append(_single_query_round(name))
    timings = {k: round(min(v), 4) for k, v in query_rounds.items()}

    # flagship throughput: input rows consumed by the quantization kernel.
    # Fixed job overhead (~0.3-0.5s local) dominates at 100k rows, so also
    # measure a 16x-replicated input where throughput amortizes — the number
    # that actually predicts cluster-scale behavior.
    n_events = spark.read.parquet(os.path.join(target, "events.parquet")).count()
    t0 = time.perf_counter()
    force(registry.QUERIES["window_lag_diff"](spark, target))
    steady = time.perf_counter() - t0

    from pyspark.sql import functions as F
    from epss_spark.operators.quantize import changed_scores
    from epss_spark.tables import load_table

    # Replicate the events table 64x with shifted keys via ONE scan +
    # explode (a 64-branch self-union re-reads the file 64 times and
    # measures plan overhead, not the kernel). 6.4M rows is where the
    # window's per-row cost dominates fixed job overhead on this machine.
    reps = 64
    # events.parquet is one split at this sf, so without a repartition the
    # 64x explode generates 6.4M rows on ONE task before the window shuffle
    # — measuring generation serialism, not the kernel (2.5s -> 1.3s).
    ev = (
        load_table(spark, target, "events")
        .select("event_id", "user_id", "ts", "value")
        .repartition(32)
    )
    big = (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("user_id", F.col("user_id") + F.col("rep").cast("bigint") * 1_000_000)
        .drop("rep")
    )
    def _flagship_round() -> float:
        t0 = time.perf_counter()
        force(changed_scores(big, key="user_id", time="ts", value="value", tiebreak="event_id"))
        return round(time.perf_counter() - t0, 4)

    flagship_pair = _pair_gate([_flagship_round() for _ in range(3)], _flagship_round)
    scaled_sec = min(flagship_pair)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": os.path.basename(os.path.normpath(target)),
                "workload_scale": WORKLOAD_SCALE,
                "pair_totals": pair_totals,
                "query_pairs": query_rounds,
                "calibration_sec": round(calib, 4),
                "flagship_input_rows": n_events,
                "flagship_rows_per_sec": round(n_events / steady) if steady else None,
                "flagship_scaled_input_rows": n_events * reps,
                "flagship_scaled_rows_per_sec": round(n_events * reps / scaled_sec)
                if scaled_sec
                else None,
                "epss_pipeline_input_rows": epss_rows,
                "epss_pipeline_cold_sec": round(epss_cold_sec, 4),
                "epss_pipeline_warmup_sec": epss_warmup_sec,
                "epss_pipeline_pair_sec": epss_pair,
                "flagship_scaled_pair_sec": flagship_pair,
                "epss_pipeline_sec": round(epss_sec, 4),
                "epss_pipeline_rows_per_sec": round(epss_rows / epss_sec) if epss_sec else None,
                "epss_pipeline_full_sec": round(epss_full_sec, 4),
                "epss_pipeline_full_rows_per_sec": round(epss_rows / epss_full_sec)
                if epss_full_sec
                else None,
                "epss_pipeline_bucketed_sec": round(epss_bucketed_sec, 4),
                "epss_pipeline_bucketed_rows_per_sec": round(epss_rows / epss_bucketed_sec)
                if epss_bucketed_sec
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
