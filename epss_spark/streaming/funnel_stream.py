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
sessionize streams — but it is no longer silent: each epoch counts the
step-type events that arrived older than their key's committed fold
timestamp and commits (epoch, n_late_events, n_late_keys) to the
`<state_dir>.late` sibling artifact (epoch-scoped, so replay-stable);
read it with `late_counts`. A nonzero counter means the
time-partitioned-per-key contract was violated and the snapshot may
undercount conversions relative to a batch re-run.

State size: one (key, step, micros) row per key per epoch it appears
in. The store auto-compacts in-stream every `compact_every` epochs
(dedup_stream.autocompact_epoch, keep-latest fixpoint transform), so
per-batch prior reads stay O(compact_every) epoch dirs; a terminated
stream's store can still be flattened with `compact_artifact`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epss_spark.operators import dedup, sessionize
from epss_spark.streaming.carried_state import (
    CarriedEpoch,
    run_carried_epoch,
    start_carried_stream,
)
from epss_spark.streaming.dedup_stream import read_artifact, read_late_counts


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
    chunk_size: int = 65536,
    track_late: bool = True,
    compact_every: int | None = 64,
) -> None:
    """One idempotent epoch: resume every key's funnel fold from its
    committed state (as of BEFORE this epoch — a replay recomputes the
    identical rows) and append the advanced states epoch-scoped. Every
    key that appears in the batch gets a state row even when no step
    matches — the snapshot's base count needs users-seen, matching the
    batch funnel's distinct-key base. The `steps` list is part of the
    store's identity: one store, one step sequence.

    The fold itself is the hot-key-safe chunked prefix-fold
    (operators/sessionize.py::funnel_fold_states) with the committed
    state as each key's init — a bot key flooding one batch never
    materializes more than `chunk_size` of its events in one task.
    `track_late` additionally commits this epoch's out-of-order count
    to the `<state_path>.late` sibling (module docstring) — one extra
    bounded aggregate over the batch joined to the prior state. Store
    layout, replay idempotency, late accounting, and compaction are the
    shared carried-state shell (streaming/carried_state.py); this is a
    state-only stream (delta=None — the snapshot aggregates the state
    store directly)."""
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

    def compute(prior_raw: DataFrame, batch: DataFrame) -> CarriedEpoch:
        prior = prior_raw.select(
            key, F.col("step").alias("__pstep"), F.col("us").alias("__pus")
        )
        # only step-type events can advance the fold — filter before any
        # shuffle; keys whose batch events are all non-step still get a
        # state row (the snapshot's base count needs users-seen),
        # carried over from the prior state or bootstrapped at step 0.
        ev = batch.filter(F.col(type_col).isin(list(steps)))
        states = sessionize.funnel_fold_states(
            ev, steps, key, type_col, time, tiebreak, max_gap_seconds,
            chunk_size=chunk_size, prior=prior,
        )
        all_keys = batch.select(key).distinct()
        new_state = (
            all_keys.join(states, key, "left")
            .join(prior, key, "left")
            .select(
                key,
                F.coalesce(F.col("step"), F.col("__pstep"), F.lit(0))
                .cast("long")
                .alias("step"),
                F.coalesce(F.col("us"), F.col("__pus"), F.lit(0))
                .cast("long")
                .alias("us"),
            )
        )
        late_rows = ev.join(prior, key, "inner").filter(
            (F.col("__pstep") > 0)
            & (F.unix_micros(F.col(time)) < F.col("__pus"))
        )
        return CarriedEpoch(new_state=new_state, late_rows=late_rows)

    run_carried_epoch(
        batch_df,
        epoch_id,
        state_path,
        key,
        empty,
        compute,
        track_late=track_late,
        compact_every=compact_every,
    )


def late_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """Out-of-order accounting for a funnel state store: one row per
    epoch that processed step-type events older than their key's
    committed fold timestamp — (epoch, n_late_events, n_late_keys).
    All-zero rows mean the time-partitioned-per-key contract held;
    nonzero rows name the epochs where arrival-order folding may have
    undercounted conversions vs a batch re-run."""
    return read_late_counts(spark, state_path)


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
    chunk_size: int = 65536,
    track_late: bool = True,
    compact_every: int | None = 64,
    available_now: bool = True,
):
    """Continuous funnel maintenance over an event stream: per
    micro-batch, advance every appearing key's (step, micros) fold from
    the committed state and append the new states epoch-scoped; read
    the live report any time with `funnel_snapshot`. Scale shape per
    batch: one hot-key-safe chunked key-aggregate over the BATCH plus
    one join against the latest state of the touched keys' store (state
    is one short row per key — bucket the store by key when keys reach
    billions)."""
    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_funnel_batch(
            batch_df, epoch_id, state_dir, steps, key, type_col, time,
            tiebreak, max_gap_seconds, chunk_size=chunk_size,
            track_late=track_late, compact_every=compact_every,
        )

    return start_carried_stream(
        events_stream, checkpoint_dir, process_batch, available_now
    )
