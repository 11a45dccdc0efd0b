"""Gap-based sessionization — assign session ids to event streams.

A session ends when the gap to the next event of the same key exceeds
`gap`. Pure window algebra (no UDF, no iteration): one lag to mark
session starts, one running sum to number them — both over the SAME
(key, time) window, so Catalyst plans a single hash exchange + sort for
the whole operator. The batch twin of Structured Streaming's
F.session_window aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add `session_id` (per-key, 1-based, in time order) and
    `session_start` flag to each event."""
    order = [F.col(time).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(time)).over(w)
    # exact integer-microsecond arithmetic: a float-seconds comparison can
    # flip on exact-gap boundaries and diverge across engines
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_start = (
        prev_ts.isNull() | (F.unix_micros(F.col(time)) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_start", is_start).withColumn(
        "session_id", F.sum("session_start").over(run)
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): bounds, event count, duration seconds."""
    s = sessionize(events, key, time, gap_seconds, tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.min(time).alias("session_start_ts"),
        F.max(time).alias("session_end_ts"),
        F.count(F.lit(1)).alias("n_events"),
        # exact micros diff, then one division — identical across engines
        ((F.unix_micros(F.max(time)) - F.unix_micros(F.min(time))) / 1_000_000.0).alias(
            "duration_sec"
        ),
    )


def event_funnel(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered-sequence conversion funnel: for the step sequence
    [s1, s2, ...], a key converts through step i when an event of type
    s_i occurs STRICTLY AFTER its step-(i-1) event in (time, tiebreak)
    order — the product-analytics funnel (signup -> view -> purchase),
    which is NOT the cumulative-predicate funnel (prep.quality_funnel):
    order matters, and the same event type occurring before the previous
    step does not count.

    Returns one row per step: (step, event_type, n_converted,
    conversion) where conversion = n_converted / previous step's count
    (step 1 converts from the total distinct-key base), rounded to 6 dp.

    `max_gap_seconds` bounds the time between CONSECUTIVE steps (the
    "purchase within a day of viewing" form). Because the gap to the
    previous step grows monotonically with event time, "first matching
    event must fall within the gap" and "earliest matching event within
    the gap" coincide — the fold checks the gap on the candidate match,
    and the SQL replay is still a per-step min over gap-filtered keys.

    Scale shape: events are FILTERED to the step types before the one
    (key)-aggregate shuffle (pushed to the scan); each key folds its
    time-sorted (time, tiebreak, type) structs through a single
    JVM-side F.aggregate that walks the sequence once (state = steps
    reached so far) — no self-join per step, no window. Per-key state is
    that key's step-type events only. The per-step histogram is a
    bounded eager fetch (<= n_steps+1 rows, the quality_funnel
    precedent); the result is a literal DataFrame."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.filter(F.col(type_col).isin(list(steps)))
    per_key = ev.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(time), F.col(tiebreak), F.col(type_col)))
        ).alias("__seq")
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    if max_gap_seconds is None:
        reached = F.aggregate(
            "__seq",
            F.lit(0),
            lambda acc, x: F.when(
                (acc < len(steps)) & (x[type_col] == F.element_at(steps_lit, acc + 1)),
                acc + 1,
            ).otherwise(acc),
        )
    else:
        # state carries (step, micros of the previous step's event) so the
        # gap check stays exact integer arithmetic (the sessionize rule)
        gap_us = F.lit(int(max_gap_seconds) * 1_000_000)
        init = F.struct(
            F.lit(0).alias("step"), F.lit(0).cast("long").alias("us")
        )
        reached = F.aggregate(
            "__seq",
            init,
            lambda acc, x: F.when(
                (acc["step"] < len(steps))
                & (x[type_col] == F.element_at(steps_lit, acc["step"] + 1))
                & (
                    (acc["step"] == 0)
                    | (F.unix_micros(x[time]) - acc["us"] <= gap_us)
                ),
                F.struct(
                    (acc["step"] + 1).alias("step"),
                    F.unix_micros(x[time]).alias("us"),
                ),
            ).otherwise(acc),
            lambda acc: acc["step"],
        )
    hist = dict(
        per_key.select(reached.alias("__r")).groupBy("__r").count().collect()
    )
    base = events.select(key).distinct().count()
    rows, prev = [], base
    for i, s in enumerate(steps):
        n = sum(c for r, c in hist.items() if r >= i + 1)
        conv = math.floor(n / prev * 1e6 + 0.5) / 1e6 if prev > 0 else None
        rows.append((i + 1, s, n, conv))
        prev = n
    return events.sparkSession.createDataFrame(
        rows, "step long, event_type string, n_converted long, conversion double"
    )


def value_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Robust per-group anomaly summary: median and MAD (median absolute
    deviation, scaled by the normal-consistency constant 1.4826) of
    `value_col`, and how many rows fall outside median +- n_sigmas
    robust sigmas — the monitoring rule that survives the outliers it
    is hunting (mean/stddev get dragged by the very anomalies a burst
    of bad telemetry injects; the median/MAD breakdown point is 50%).

    Returns one row per group: (group_col, n, median, mad,
    lo[6dp], hi[6dp], n_outliers).

    Scale shape: two grouped aggregates over the SAME key (the second
    over |x - median|, which needs the first's result joined back —
    groups are FEW, so the join broadcasts) plus one counting pass.
    Exact percentiles for the cross-engine contract; swap
    percentile_approx in at 100 TB the same way dataset_card documents.
    NULL values are ignored (percentile semantics) and never counted as
    outliers."""
    ev = events.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
    med = ev.groupBy("__g").agg(F.percentile("__v", F.lit(0.5)).alias("__med"))
    dev = (
        ev.join(F.broadcast(med), "__g")
        .select("__g", "__med", F.abs(F.col("__v") - F.col("__med")).alias("__ad"))
        .groupBy("__g")
        .agg(
            F.max("__med").alias("__med"),
            (F.percentile("__ad", F.lit(0.5)) * F.lit(1.4826)).alias("__mad"),
        )
    )
    lo = F.col("__med") - F.lit(float(n_sigmas)) * F.col("__mad")
    hi = F.col("__med") + F.lit(float(n_sigmas)) * F.col("__mad")
    flagged = (
        ev.join(F.broadcast(dev), "__g")
        .select(
            "__g", "__med", "__mad",
            ((F.col("__v") < lo) | (F.col("__v") > hi)).alias("__out"),
            F.col("__v").isNotNull().alias("__nn"),
        )
        .groupBy("__g")
        .agg(
            F.sum(F.col("__nn").cast("long")).alias("n"),
            F.round(F.max("__med"), 6).alias("median"),
            F.round(F.max("__mad"), 6).alias("mad"),
            F.round(F.max(lo), 6).alias("lo"),
            F.round(F.max(hi), 6).alias("hi"),
            F.sum(F.coalesce(F.col("__out").cast("long"), F.lit(0))).alias("n_outliers"),
        )
        .withColumnRenamed("__g", group_col)
    )
    return flagged


def retention_cohorts(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
) -> DataFrame:
    """Day-N retention matrix: users cohorted by first-seen day; for
    each (cohort_day, day_offset), how many cohort members were active
    that many days later and what fraction of the cohort that is — the
    standard growth-accounting companion to the DAU rollup (is the
    product keeping the users each cohort brought?).

    Returns (cohort_day, day_offset, n_active, cohort_size,
    retention_rate[6dp]) with day_offset 0 rows equal to the cohort
    size by construction.

    Scale shape: one distinct (user, day) aggregate, one min-day
    cohorting aggregate, a key-equi join back (co-partitions on the
    user key), and a (cohort, offset) count — output is bounded by
    days^2 / 2 regardless of user count."""
    d = events.select(F.col(key).alias("__u"), F.col(time).cast("date").alias("__day")).distinct()
    first = d.groupBy("__u").agg(F.min("__day").alias("__cohort"))
    act = (
        d.join(first, "__u")
        .select("__cohort", F.datediff("__day", F.col("__cohort")).alias("__off"))
        .groupBy("__cohort", "__off")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size = first.groupBy("__cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        act.join(F.broadcast(size), "__cohort")
        .select(
            F.col("__cohort").alias("cohort_day"),
            F.col("__off").cast("long").alias("day_offset"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )
