"""Incremental conversion funnels — event_funnel as a stream.

The batch funnel (operators/sessionize.py::event_funnel) folds each
key's full time-sorted event sequence. A stream cannot re-sort history
per micro-batch, but the fold's state is tiny and total: (step reached,
micros of the step event). Each micro-batch therefore resumes every
key's fold from its persisted state, and the per-key state store is
maintained exactly like the keep-latest snapshot store: epoch-scoped
parquet appends, latest-epoch-wins reads (dedup_stream module docstring
for the replay-idempotency design — a retry of epoch N reads state as
of epoch N-1 via `_read_committed` and recomputes bit-identical rows).

Ordering contract: batches must arrive time-partitioned per key (the
natural shape for file-drops of hourly/daily event logs) — splitting a
key's time-sorted sequence into prefix folds with carried state IS the
batch fold, so `funnel_snapshot` equals the one-shot `event_funnel`
over the union (pinned in tests). A late event older than a key's
current step timestamp is processed at arrival order, same as the
sessionize streams.

State size: one (key, step, micros) row per key per epoch it appears
in; compact with
`compact_artifact(spark, state_dir, transform=lambda df:
keep_latest(df, key, "__epoch"))` on the keep-latest fixpoint rule.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epss_spark.operators import dedup
from epss_spark.streaming.dedup_stream import (
    _read_committed,
    _write_epoch,
    read_artifact,
)


def process_funnel_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    max_gap_seconds: int | None = None,
) -> None:
    """One idempotent epoch: resume every key's funnel fold from its
    committed state (as of BEFORE this epoch — a replay recomputes the
    identical rows) and append the advanced states epoch-scoped. Every
    key that appears in the batch gets a state row even when no step
    matches — the snapshot's base count needs users-seen, matching the
    batch funnel's distinct-key base. The `steps` list is part of the
    store's identity: one store, one step sequence."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    key_field = batch_df.schema[key]
    from pyspark.sql.types import LongType, StructField, StructType

    empty = StructType(
        [
            StructField(key, key_field.dataType),
            StructField("step", LongType()),
            StructField("us", LongType()),
            StructField("__epoch", LongType()),
        ]
    )
    prior = dedup.keep_latest(
        _read_committed(spark, state_path, int(epoch_id), empty_schema=empty),
        key,
        "__epoch",
    ).select(key, F.col("step").alias("__pstep"), F.col("us").alias("__pus"))

    # non-step events can never advance the fold — wrap the struct in a
    # when() so collect_list skips them (it drops nulls) while the
    # groupBy still emits a row for EVERY key seen, which is what the
    # snapshot's base count needs. At typical step-type selectivity this
    # cuts the shuffled/sorted payload by orders of magnitude.
    step_struct = F.when(
        F.col(type_col).isin(list(steps)),
        F.struct(F.col(time), F.col(tiebreak), F.col(type_col)),
    )
    per_key = batch_df.groupBy(key).agg(
        F.array_sort(F.collect_list(step_struct)).alias("__seq")
    )
    joined = per_key.join(prior, key, "left")
    init = F.struct(
        F.coalesce(F.col("__pstep"), F.lit(0)).cast("long").alias("step"),
        F.coalesce(F.col("__pus"), F.lit(0)).cast("long").alias("us"),
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    n = len(steps)
    gap_us = (
        F.lit(int(max_gap_seconds) * 1_000_000) if max_gap_seconds is not None else None
    )

    def merge(acc, x):
        cond = (acc["step"] < n) & (
            x[type_col] == F.element_at(steps_lit, (acc["step"] + 1).cast("int"))
        )
        if gap_us is not None:
            cond = cond & (
                (acc["step"] == 0) | (F.unix_micros(x[time]) - acc["us"] <= gap_us)
            )
        return F.when(
            cond,
            F.struct(
                (acc["step"] + 1).alias("step"),
                F.unix_micros(x[time]).alias("us"),
            ),
        ).otherwise(acc)

    new_state = joined.select(
        F.col(key),
        F.aggregate("__seq", init, merge).alias("__st"),
    ).select(
        key,
        F.col("__st.step").alias("step"),
        F.col("__st.us").alias("us"),
        F.lit(int(epoch_id)).alias("__epoch"),
    )
    _write_epoch(new_state, state_path, epoch_id)


def funnel_snapshot(
    spark: SparkSession,
    state_path: str,
    steps: list[str],
    key: str = "user_id",
) -> DataFrame:
    """Current funnel report from the state store: identical row shape
    and semantics to the batch event_funnel over everything the stream
    has seen (base = every key that has appeared; step i = keys whose
    fold reached >= i). Bounded eager fetch of the <= n_steps+1
    histogram rows; the result is a literal DataFrame."""
    state = dedup.keep_latest(read_artifact(spark, state_path), key, "__epoch")
    hist = dict(state.groupBy("step").count().collect())
    base = sum(hist.values())
    rows, prev = [], base
    for i, s in enumerate(steps):
        cnt = sum(c for r, c in hist.items() if r >= i + 1)
        conv = math.floor(cnt / prev * 1e6 + 0.5) / 1e6 if prev > 0 else None
        rows.append((i + 1, s, cnt, conv))
        prev = cnt
    return spark.createDataFrame(
        rows, "step long, event_type string, n_converted long, conversion double"
    )


def start_funnel_stream(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    max_gap_seconds: int | None = None,
    available_now: bool = True,
):
    """Continuous funnel maintenance over an event stream: per
    micro-batch, advance every appearing key's (step, micros) fold from
    the committed state and append the new states epoch-scoped; read
    the live report any time with `funnel_snapshot`. Scale shape per
    batch: one key-aggregate over the BATCH plus one join against the
    latest state of the touched keys' store (state is one short row per
    key — bucket the store by key when keys reach billions)."""
    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_funnel_batch(
            batch_df, epoch_id, state_dir, steps, key, type_col, time,
            tiebreak, max_gap_seconds,
        )

    writer = events_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
