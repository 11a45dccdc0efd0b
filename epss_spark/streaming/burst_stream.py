"""Continuous volume-anomaly monitoring — daily_burst_zscore as a stream.

The batch monitor (operators/sessionize.py::daily_burst_zscore) scores
each (event_type, day) count against its trailing-window baseline. The
streaming form maintains the (event_type, day, n) count store
incrementally: each micro-batch appends its OWN per-(type, day) counts
as an epoch-scoped delta (dedup_stream module docstring for the
replay-idempotency design — a retried epoch overwrites `epoch-N/` with
the identical recomputed delta, so counts can never double), and the
live report sums the committed deltas and runs the IDENTICAL z
expression (`zscore_from_daily_counts`).

Unlike the funnel and history streams, this store needs NO ordering
contract and no `.late` sibling: per-day counts are additive and
commutative, so events may arrive in any order, split across any
batches, and late events simply add to their (type, day) cell — the
snapshot equals the batch monitor over the union unconditionally
(pinned in tests, including out-of-order delivery). The one semantic
difference an operator must know: a late event can RESCORE history
(its day's n changes, and that day sits in the NEXT 7 days' baselines)
— which is the correct answer, not an artifact.

State size: at most |event types| x |days touched| rows per epoch,
folded by the additive compaction transform (groupBy sum) every
`compact_every` epochs, so per-read state stays O(types x days +
compact_every deltas) regardless of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epss_spark.operators.sessionize import zscore_from_daily_counts
from epss_spark.streaming.dedup_stream import (
    _write_epoch,
    autocompact_epoch,
    read_artifact,
)


def _fold_counts(df: DataFrame) -> DataFrame:
    """Additive compaction transform: collapse per-epoch deltas into one
    row per (event_type, day). Carrying max(__epoch) keeps every folded
    row attributed to an already-committed epoch, so `_read_committed`'s
    replay filter (exclude rows >= the replayed epoch) still excludes
    exactly the in-flight epoch's rows — same property the keep-latest
    fold relies on."""
    return df.groupBy("event_type", "day").agg(
        F.sum("n").alias("n"), F.max("__epoch").alias("__epoch")
    )


def process_burst_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    type_col: str = "event_type",
    time: str = "ts",
    compact_every: int | None = 64,
) -> None:
    """One idempotent epoch: aggregate THIS batch's (type, day) counts —
    a pure function of the batch, independent of all prior state, which
    is why replay safety is free here — and append them epoch-scoped.
    No state read at all on the write path; the store is only ever
    summed at snapshot/compaction time."""
    if batch_df.isEmpty():
        return
    delta = (
        batch_df.select(
            F.col(type_col).alias("event_type"),
            F.col(time).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__epoch", F.lit(int(epoch_id)))
    )
    _write_epoch(delta, state_path, epoch_id)
    autocompact_epoch(
        batch_df.sparkSession,
        state_path,
        epoch_id,
        compact_every,
        transform=_fold_counts,
    )


def burst_snapshot(
    spark: SparkSession,
    state_path: str,
    window_days: int = 7,
    min_days: int = 3,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Current anomaly report from the count store: sum the committed
    deltas per (event_type, day) and score with the exact batch
    expression — identical rows to daily_burst_zscore over everything
    the stream has seen, in any arrival order. Lazy: one additive
    aggregate over the store plus the bounded (types x days) window."""
    daily = (
        read_artifact(spark, state_path)
        .groupBy("event_type", "day")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return zscore_from_daily_counts(daily, window_days, min_days, z_thresh)


def start_burst_stream(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    type_col: str = "event_type",
    time: str = "ts",
    compact_every: int | None = 64,
    available_now: bool = True,
):
    """Continuous burst monitoring over an event stream: per micro-batch,
    append the batch's (type, day) count delta epoch-scoped; read the
    live z-score report any time with `burst_snapshot`. Per-batch cost
    is ONE aggregate of the batch — no store read, no join — making
    this the cheapest maintenance stream in the module family."""
    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_burst_batch(
            batch_df, epoch_id, state_dir, type_col, time,
            compact_every=compact_every,
        )

    writer = events_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
