"""Mergeable distinct-count sketches: an engine-portable HyperLogLog.

HLL (Flajolet et al. 2007) is THE approximate-distinct structure for
100 TB analytics: per group it keeps m = 2^b max-of-rho registers, so
cardinality state is bounded at m small ints per group no matter how many
rows stream through, the aggregation is map-side combinable, and two
sketches merge by elementwise max — the shape that makes incremental /
cross-partition distinct counts O(registers) instead of O(distinct).

Spark's built-in approx_count_distinct is the same algorithm but its
hash (xxhash64 into a private register layout) is not reproducible in
other engines. This implementation derives registers from the codebase's
engine-portable md5-prefix hash (operators/dedup.py::_md5_60bit) and
keeps EVERY intermediate exact:

- register index j = top b bits of the 60-bit hash; rho = leading-zero
  rank of the remaining wb = 60-b bits (bit_length via length(bin(w)) —
  identical string semantics in Spark and DuckDB; no float log2, whose
  boundary rounding differs per libm).
- the harmonic sum is computed as an INTEGER: sum of 2^(wb+1 - M_j)
  (each term a dyadic power, the total < 2^62 for b >= 9) — summation
  order cannot perturb it, unlike a float sum of 2^-M.
- the only floats are the final alpha*m^2*2^(wb+1)/S division and the
  small-range linear-counting ln, rounded to 4 dp (the cross-engine
  contract used across this codebase).

So the estimate is bit-for-bit reproducible across engines and checkable
against a DuckDB oracle (agg_hll_distinct) — unusual for a sketch, and
exactly why it can sit in the driver-verified surface.

No counterpart in the reference (epss/ has no approximate aggregates);
extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epss_spark.operators.dedup import _md5_60bit


def _alpha(m: int) -> float:
    # standard bias constants; m >= 128 uses the asymptotic formula
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 9,
) -> DataFrame:
    """The sketch TABLE: (group..., j, M) with at most m = 2^b register
    rows per group — the artifact to persist for incremental distinct
    counting (tonight's append sketches merge into it with hll_merge;
    nothing ever re-reads history). One map-side-combinable aggregation:
    the shuffle carries <= m rows per (task, group)."""
    if not 4 <= b <= 16:
        raise ValueError(f"hll_registers: b={b} outside [4, 16]")
    wb = 60 - b
    h = _md5_60bit(F.col(value_col).cast("string"))
    j = F.shiftright(h, wb)
    w = h.bitwiseAND(F.lit((1 << wb) - 1))
    rho = F.when(w == F.lit(0), F.lit(wb + 1)).otherwise(
        F.lit(wb + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(*sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union sketches by elementwise register max — the lossless HLL
    merge: estimate(merge(A, B)) == estimate(sketch(A ∪ B)) EXACTLY
    (register tables are deterministic, so this is an equality, not an
    approximation — pinned by test)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "j").agg(F.max("M").alias("M"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    b: int = 9,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """Cardinality estimate from a register table: alpha_m * m^2 / Z with
    the small-range linear-counting correction (E <= 2.5m and empty
    registers present -> m*ln(m/zeros)). The harmonic sum rides as an
    exact BIGINT (see module docstring); relative error ~1.04/sqrt(m)
    (4.6% at b=9). Output rounded to 4 dp."""
    m = 1 << b
    wb = 60 - b
    scale = float(1 << (wb + 1))
    am2 = _alpha(m) * m * m
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wb + 1} - M)")).alias("__s"),
        F.count(F.lit(1)).alias("__nz"),
    )
    z = F.lit(m) - F.col("__nz")
    s_full = (F.col("__s") + z.cast("long") * F.lit(1 << (wb + 1))).cast("double")
    e_raw = F.lit(am2) * F.lit(scale) / s_full
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (z > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / z.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias(out_col))


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 9,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """Per-group approximate distinct count: sketch + estimate in one
    call. Use hll_registers/hll_estimate separately when the sketch
    itself is the artifact (incremental pipelines)."""
    return hll_estimate(
        hll_registers(df, group_cols, value_col, b), group_cols, b, out_col
    )


# ---------------------------------------------------------------------------
# Bloom filter — broadcastable set membership
# ---------------------------------------------------------------------------


def _bloom_positions(value, m: int, k: int):
    """k md5-derived bit positions for one value expression (lazy list of
    Column ints in [0, m))."""
    return [
        _md5_60bit(F.concat(F.lit(f"bloom{i}|"), value)) % m for i in range(k)
    ]


def bloom_build(
    values: DataFrame, value_col: str, m: int = 1 << 14, k: int = 3
) -> dict[int, int]:
    """Build an m-bit Bloom filter over a column: word-index -> 64-bit
    word, collected to the driver (m/64 longs — 2 KB at the default
    m=2^14, bounded by construction like the DSIR weight model). The
    aggregation is a groupBy(word) bit_or — map-side combinable, at most
    m/64 result rows regardless of input size."""
    if m % 64 or m <= 0:
        raise ValueError(f"bloom_build: m={m} must be a positive multiple of 64")
    pos = F.explode(F.array(*_bloom_positions(F.col(value_col), m, k))).alias("p")
    rows = (
        values.where(F.col(value_col).isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m1"),
        )
        .groupBy("w")
        .agg(F.bit_or("m1").alias("bits"))
        .collect()
    )
    return {r.w: r.bits for r in rows}


def bloom_member(value, sketch: dict[int, int], m: int, k: int = 3):
    """Membership test expression: ALL k bits set. The sketch rides as a
    constant-folded literal long array (m/64 elements) — element_at +
    bit_get per position, O(1) each, zero joins. False positives at the
    standard Bloom rate (fill^k); NO false negatives — both properties
    deterministic given the data, so results are engine-reproducible."""
    words = F.array(*[F.lit(sketch.get(w, 0)) for w in range(m // 64)])
    cond = None
    for p in _bloom_positions(value, m, k):
        hit = (
            F.bit_get(
                F.element_at(words, (F.shiftright(p, 6) + 1).cast("int")),
                (p % 64).cast("int"),
            )
            == 1
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_contamination(
    docs: DataFrame,
    bench_docs: DataFrame,
    m: int = 1 << 14,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination via a Bloom sketch of the benchmark's
    shingle set: per corpus document, the fraction of its distinct
    3-gram shingles that the filter reports as benchmark shingles —
    an UPPER BOUND on dedup.benchmark_contamination's exact fraction
    (no false negatives; pinned by test).

    The 100 TB story vs the exact operator: the exact path broadcasts
    the full benchmark shingle strings (MBs); the Bloom path ships m/64
    longs (2 KB at m=2^14, 128 KB at m=2^20) folded into the plan, and
    the corpus pass is a PURE PROJECTION — membership is a fold over
    each document's shingle array, zero joins, zero shuffles, nothing
    corpus-sized moves. Flag-then-verify: docs over threshold go to the
    exact check, everything else never shuffles."""
    from epss_spark.operators.text import with_shingles

    sketch = bloom_build(
        with_shingles(bench_docs, id_col, text_col).select(
            F.explode("shingles").alias("sh")
        ),
        "sh",
        m,
        k,
    )
    sh = with_shingles(docs, id_col, text_col)
    hits = F.size(F.filter("shingles", lambda s: bloom_member(s, sketch, m, k)))
    n = F.size("shingles")
    return sh.select(
        id_col,
        n.alias("n_shingles"),
        F.round(hits.cast("double") / n, 6).alias("bloom_frac"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — bounded-memory frequency estimates
# ---------------------------------------------------------------------------


def cms_build(
    values: DataFrame, value_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over a value
    stream: a (row, col, count) table with at most d*w rows TOTAL —
    bounded frequency state no matter how many values stream through
    (the hot-token counter that never needs the full vocabulary). All
    integer arithmetic on md5-derived columns: the sketch is
    deterministic and engine-identical.

    Scale shape: d rows per input value, collapsed by map-side partial
    aggregation to <= d*w per task before the one tiny shuffle. Sketches
    MERGE BY ELEMENTWISE SUM exactly: cms(A ∪ B) == cms_merge(cms(A),
    cms(B)) (pinned by test) — persist per-day sketches, sum them for
    any window."""
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (_md5_60bit(F.concat(F.lit(f"cm{i}|"), F.col(value_col))) % w).alias("j"),
                )
                for i in range(d)
            ]
        )
    ).alias("p")
    return (
        values.where(F.col(value_col).isNotNull())
        .select(pos)
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact sketch union: elementwise sum of counts."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "j").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query frequency estimates for candidate values: the min
    over the d counters each value hashes to. Always >= the true count
    (pinned); expected excess <= stream_length * e / w. The candidate
    side carries its d (i, j) coordinates and equi-joins the tiny
    sketch (AQE broadcasts it — <= d*w rows); missing cells count 0."""
    cand = candidates.select(value_col).where(F.col(value_col).isNotNull()).distinct()
    coords = cand.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (_md5_60bit(F.concat(F.lit(f"cm{i}|"), F.col(value_col))) % w).alias(
                            "j"
                        ),
                    )
                    for i in range(d)
                ]
            )
        ).alias("p"),
    ).select(value_col, F.col("p.i").alias("i"), F.col("p.j").alias("j"))
    return (
        coords.join(sketch, ["i", "j"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias(out_col))
    )


# ---------------------------------------------------------------------------
# q-digest: mergeable quantile sketch over a bounded integer domain
# ---------------------------------------------------------------------------


def qdigest_build(
    df: DataFrame,
    value_col: str,
    levels: int = 8,
    k: int = 64,
) -> DataFrame:
    """Build a q-digest (Shrivastava et al., SenSys 2004) over integer
    values in [0, 2^levels): the mergeable QUANTILE sketch that completes
    the engine's sketch set (HLL distinct / Bloom membership / CMS
    frequency / q-digest rank). Returns the sketch TABLE (node_id, cnt)
    in dyadic heap numbering (node n at depth d covers a width-2^(levels-d)
    value range; leaves are 2^levels + value). After compression the
    sketch holds at most ~3k nodes regardless of input size, rank queries
    are answered within N*levels/k, and two sketches merge by summing
    node counts and recompressing — the daily-sketch-table shape of
    hll_registers/cms_build, for "token-length p95 over any date window"
    style queries that never re-read history.

    Everything is DETERMINISTIC integer arithmetic (classic q-digest has
    no randomness at all), so unlike KLL the whole structure — node ids,
    counts, and query answers — is bit-for-bit reproducible in DuckDB;
    the oracle replays the bottom-up compression as `levels` chained CTE
    rounds (the bpe_merges oracle pattern).

    Compression (bottom-up, per depth): a family (parent + its present
    children) whose total count is <= floor(N/k) collapses into the
    parent; larger families keep every member. Values outside the domain
    raise (checked with one bounded min/max action); NULLs are ignored.

    Scale shape: ONE corpus pass (groupBy(value) count — map-side
    partials absorb hot values), then `levels` rounds of joins over the
    bounded node frame (<= levels x distinct values, collapsing as it
    compresses); lineage is checkpoint-truncated every few rounds."""
    vals = df.select(F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull()
    )
    if levels <= 16:
        # bounded-domain fast path (optimization r15, guide §1.3 fewer
        # passes): a valid input has <= 2^levels distinct values, so ONE
        # corpus pass (groupBy(v) count, map-side partials) yields the
        # leaf table AND the domain-check stats — the separate min/max/
        # count action was a second full pass over the (often expensive,
        # e.g. tokenize-derived) value column. The limit caps the
        # collect for out-of-domain inputs: > 2^levels groups proves a
        # domain violation before anything large reaches the driver.
        grouped = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
        rows = grouped.limit((1 << levels) + 1).collect()
        if len(rows) > (1 << levels):
            raise ValueError(
                f"more than {1 << levels} distinct values: input outside the "
                f"q-digest domain [0, {1 << levels}); raise `levels` or "
                "pre-scale the column"
            )
        if rows:
            lo = min(int(r["v"]) for r in rows)
            hi = max(int(r["v"]) for r in rows)
            if lo < 0 or hi >= (1 << levels):
                raise ValueError(
                    f"values [{lo}, {hi}] outside the q-digest domain "
                    f"[0, {1 << levels}); raise `levels` or pre-scale the column"
                )
        n = sum(int(r["cnt"]) for r in rows)
        cnt = {(1 << levels) + int(r["v"]): int(r["cnt"]) for r in rows}
        t = max(1, n // k)
        return df.sparkSession.createDataFrame(
            sorted(_qdigest_compress_local(cnt, t, levels).items()),
            "node_id bigint, cnt bigint",
        )
    stats = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
    ).first()
    if stats["n"] and (stats["lo"] < 0 or stats["hi"] >= (1 << levels)):
        raise ValueError(
            f"values [{stats['lo']}, {stats['hi']}] outside the q-digest domain "
            f"[0, {1 << levels}); raise `levels` or pre-scale the column"
        )
    leaves = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select((F.lit(1 << levels) + F.col("v")).alias("node_id"), "cnt")
    )
    t = max(1, int(stats["n"] or 0) // k)
    # sketch-bounded iterative loop: size-based shuffle coalescing
    # (optimization r15, layout.size_coalesced_shuffles) — every round's
    # node frame is <= levels x distinct values (<= ~3k after
    # compression), so the defaultParallelism floor made each of the
    # `levels` checkpoint rounds pay ~32 tasks for KBs of data
    from epss_spark.operators.layout import size_coalesced_shuffles

    with size_coalesced_shuffles(df.sparkSession):
        return _qdigest_compress(leaves, t, levels)


def _qdigest_compress_local(cnt: dict, t: int, levels: int) -> dict:
    """The driver-side exact replay of the distributed compression
    rounds: identical family sums, <= t collapse, and pre-existing
    parent handling, on a {node_id: cnt} dict (optimization r15; pinned
    against the distributed loop by test)."""
    for depth in range(levels, 0, -1):
        lo, hi = 1 << depth, 1 << (depth + 1)
        fams: dict = {}
        for nid, c in list(cnt.items()):
            if lo <= nid < hi:  # child at this depth -> its family
                fams[nid // 2] = fams.get(nid // 2, 0) + c
            elif lo // 2 <= nid < hi // 2:  # pre-existing parent
                fams[nid] = fams.get(nid, 0) + c
        for pid, total in fams.items():
            if total <= t:
                cnt.pop(2 * pid, None)
                cnt.pop(2 * pid + 1, None)
                cnt[pid] = total
    return cnt


def _qdigest_compress(nodes: DataFrame, t: int, levels: int) -> DataFrame:
    """Bottom-up q-digest compression: for depth = levels..1, collapse
    every family (parent + present children) with total count <= t into
    the parent. Handles pre-existing parent nodes (the merge path).

    Optimization r15 (guide §1.2 "the distributed algorithm"): for the
    realistic sketch domain (levels <= 16, i.e. <= 65,536 leaf slots)
    the node frame is BOUNDED at <= 2^(levels+1) rows by construction —
    the same bounded-artifact class as the BPE merge table and the BM25
    stats — so the `levels` rounds of joins + eager checkpoints (8
    distributed jobs for a <= 511-row frame at the registry's levels=8)
    are replaced by one bounded collect and an exact integer replay on
    the driver; the distributed loop remains the >16-level path. The
    replay is op-for-op the same arithmetic (family sums, <= t
    collapse, parent handling), pinned identical by
    tests/test_sketches.py::test_qdigest_compress_paths_identical."""
    if levels <= 16:
        cnt: dict[int, int] = {}
        for r in nodes.collect():
            nid = int(r["node_id"])
            cnt[nid] = cnt.get(nid, 0) + int(r["cnt"])
        return nodes.sparkSession.createDataFrame(
            sorted(_qdigest_compress_local(cnt, t, levels).items()),
            "node_id bigint, cnt bigint",
        )
    for depth in range(levels, 0, -1):
        lo, hi = 1 << depth, 1 << (depth + 1)
        children = nodes.filter((F.col("node_id") >= lo) & (F.col("node_id") < hi))
        parents = nodes.filter(
            (F.col("node_id") >= lo // 2) & (F.col("node_id") < hi // 2)
        )
        others = nodes.filter((F.col("node_id") >= hi) | (F.col("node_id") < lo // 2))
        fam = (
            children.groupBy((F.col("node_id") / 2).cast("long").alias("pid"))
            .agg(F.sum("cnt").alias("csum"))
            .join(parents.withColumnRenamed("node_id", "pid"), "pid", "full_outer")
            .select(
                "pid",
                (F.coalesce("csum", F.lit(0)) + F.coalesce("cnt", F.lit(0))).alias(
                    "total"
                ),
                F.col("cnt").alias("pcnt"),
            )
        )
        kept_children = children.join(
            fam.filter(F.col("total") > t).select(
                (F.col("pid")).alias("__p")
            ),
            (F.col("node_id") / 2).cast("long") == F.col("__p"),
            "left_semi",
        )
        merged = fam.filter(F.col("total") <= t).select(
            F.col("pid").alias("node_id"), F.col("total").alias("cnt")
        )
        kept_parents = fam.filter(
            (F.col("total") > t) & F.col("pcnt").isNotNull()
        ).select(F.col("pid").alias("node_id"), F.col("pcnt").alias("cnt"))
        nodes = (
            others.unionByName(kept_children)
            .unionByName(merged)
            .unionByName(kept_parents)
        )
        # eager checkpoint EVERY round: each round references `nodes` four
        # times (children/parents/others/family), so an unchecked plan
        # grows ~5x per depth — exponential in `levels`. The materialized
        # frame is sketch-bounded (<= levels x distinct values, shrinking
        # as compression proceeds), so the per-round job is tiny.
        nodes = nodes.localCheckpoint(eager=True)
    return nodes


def qdigest_merge(*sketches: DataFrame, levels: int = 8, k: int = 64) -> DataFrame:
    """Merge q-digests: sum counts per node, recompress against the
    combined N — the standard q-digest merge law. Deterministic, so
    merge-then-query is engine-reproducible like every other sketch
    here."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    summed = u.groupBy("node_id").agg(F.sum("cnt").alias("cnt"))
    n = summed.agg(F.sum("cnt")).first()[0] or 0
    from epss_spark.operators.layout import size_coalesced_shuffles

    with size_coalesced_shuffles(u.sparkSession):
        return _qdigest_compress(summed, max(1, int(n) // k), levels)


def qdigest_quantiles(
    sketch: DataFrame, qs: list[float], levels: int = 8
) -> DataFrame:
    """Answer quantile queries from a q-digest: (q, value) with value the
    standard q-digest answer — the upper end of the first node (in
    post-order: ascending range end, then ascending width) whose running
    count reaches rank ceil(q*N). Guaranteed within levels*N/k ranks of
    exact (pinned by property test). All inputs are sketch-bounded, so
    the window and join are tiny by construction."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    # depth from the heap id via the engine's length(bin(x)) idiom (no
    # float log2); range end and width are integer arithmetic. SQL-expr
    # shiftleft because the Python F.shiftleft only takes a literal
    # shift count.
    d = "(length(bin(node_id)) - 1)"
    w_sql = f"cast(shiftleft(1L, {levels} - {d}) as long)"
    lo_sql = f"(node_id - shiftleft(1L, {d})) * {w_sql}"
    annotated = sketch.select(
        "node_id",
        "cnt",
        F.expr(f"{lo_sql} + {w_sql}").alias("hi"),
        F.expr(w_sql).alias("w"),
    )
    w_order = Window.orderBy(F.col("hi").asc(), F.col("w").asc(), F.col("node_id").asc())
    cum = annotated.withColumn("run", F.sum("cnt").over(w_order))
    total = cum.agg(F.max("run").alias("n"))
    # rank = ceil(q * N) in INTEGER arithmetic (q as exact millionths):
    # DuckDB parses a 0.9 literal as DECIMAL while Spark uses DOUBLE, so
    # a float ceil can differ by one rank between engines right at the
    # boundary; (n*num + 999999) div 1000000 cannot.
    qf = spark.createDataFrame(
        [(float(q), int(round(q * 1_000_000))) for q in qs], "q double, num long"
    )
    rank = F.expr("(n * num + 999999) div 1000000")
    return (
        qf.crossJoin(F.broadcast(total))
        .join(cum, F.col("run") >= rank, "left")
        .groupBy("q")
        .agg((F.min(F.struct("hi", "w", "node_id"))["hi"] - 1).alias("value"))
        .orderBy("q")
    )
