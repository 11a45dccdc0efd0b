"""Continuous journey monitoring — event_transitions as a stream.

The batch operator (operators/sessionize.py::event_transitions) counts
every consecutive same-key (from_type, to_type) event pair. Transition
COUNTS are additive per pair — the same no-ordering-contract shape the
burst monitor exploits for daily counts — but forming the pairs is not:
adjacency across a micro-batch boundary needs each key's LAST event
carried forward. So this stream maintains two artifacts (both
epoch-scoped parquet, replay-idempotent per the dedup_stream module
docstring — a retried epoch overwrites `epoch-N/` with the identical
recomputed delta):

- `<state_dir>` — per-key carried state: the latest (us, tb, ty) event
  per key, keep-latest maintained exactly like the funnel stream's fold
  state (streaming/funnel_stream.py precedent).
- `<state_dir>.counts` — additive (from_type, to_type, n) deltas: each
  batch's within-batch pairs plus one boundary pair per key that had
  prior state (prior's last event -> this batch's first event).

Ordering contract: batches must arrive time-partitioned per key (the
natural shape for file-drops of hourly/daily event logs) — splitting a
key's time-sorted event sequence into batches and stitching the
boundary pair IS the batch lead() window, so `transitions_snapshot`
equals the one-shot `event_transitions` over the union (pinned in
tests). An event older than its key's carried last event is processed
at arrival order but not silently: each epoch commits
(epoch, n_late_events, n_late_keys) to the `<state_dir>.late` sibling
(read with `late_counts`); a nonzero row names the epochs where
arrival-order pairing may disagree with a batch re-run.

State size: carried state is ONE short row per key per epoch it appears
in; the counts store is bounded by |event types|^2 rows per epoch. Both
auto-compact in-stream every `compact_every` epochs (keep-latest fold
for the state, additive groupBy-sum fold for the counts), so per-batch
reads stay O(compact_every) epoch dirs for the stream's whole lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epss_spark.operators import dedup
from epss_spark.operators.sessionize import transition_probs
from epss_spark.streaming.carried_state import (
    CarriedEpoch,
    counts_path as _counts_path,
    run_carried_epoch,
    start_carried_stream,
)
from epss_spark.streaming.dedup_stream import read_artifact, read_late_counts


def _fold_transition_counts(df: DataFrame) -> DataFrame:
    """Additive compaction transform for the counts store: collapse
    per-epoch deltas into one row per (from_type, to_type). Carrying
    max(__epoch) keeps folded rows attributed to a committed epoch, so
    `_read_committed`'s replay filter still excludes exactly the
    in-flight epoch's rows (burst_stream._fold_counts precedent)."""
    return df.groupBy("from_type", "to_type").agg(
        F.sum("n").alias("n"), F.max("__epoch").alias("__epoch")
    )


def process_transitions_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    track_late: bool = True,
    compact_every: int | None = 64,
) -> None:
    """One idempotent epoch: form this batch's within-batch transition
    pairs plus the boundary pair from each key's committed carried state
    (as of BEFORE this epoch — a replay recomputes identical deltas),
    append the (from, to) count delta and the advanced carried state
    epoch-scoped. Scale shape per batch: one lead() window over the
    BATCH's key exchange (the same partitioning the carried-state join
    and the new-state aggregate reuse), one bounded |types|^2 count, one
    join against the latest state of the touched keys — no store-wide
    scan on the write path. Store layout, replay idempotency, late
    accounting, and compaction are the shared carried-state shell
    (streaming/carried_state.py)."""
    key_t = batch_df.schema[key].dataType.simpleString()
    tb_t = batch_df.schema[tiebreak].dataType.simpleString()
    ty_t = batch_df.schema[type_col].dataType.simpleString()
    empty = f"`{key}` {key_t}, us long, tb {tb_t}, ty {ty_t}, __epoch long"

    def compute(prior: DataFrame, batch: DataFrame) -> CarriedEpoch:
        p = prior.select(
            key,
            F.col("us").alias("__pus"),
            F.col("tb").alias("__ptb"),
            F.col("ty").alias("__pty"),
        )
        ev = batch.select(
            key,
            F.unix_micros(F.col(time)).alias("us"),
            F.col(tiebreak).alias("tb"),
            F.col(type_col).alias("ty"),
        )
        w = Window.partitionBy(key).orderBy(F.col("us").asc(), F.col("tb").asc())
        seq = ev.select(
            key,
            "us",
            "tb",
            "ty",
            F.row_number().over(w).alias("__rn"),
            F.lead("ty").over(w).alias("__next"),
        )
        within = seq.filter(F.col("__next").isNotNull()).select(
            F.col("ty").alias("from_type"), F.col("__next").alias("to_type")
        )
        boundary = (
            seq.filter(F.col("__rn") == 1)
            .join(p, key, "inner")
            .select(
                F.col("__pty").alias("from_type"), F.col("ty").alias("to_type")
            )
        )
        delta = (
            within.unionByName(boundary)
            .groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # advanced carried state: latest (us, tb) event per batch key,
        # never regressing behind the prior state even if this batch is
        # late — the ordering key excludes the payload (keep_latest
        # tiebreak form); prior is already restricted to batch keys
        new_state = dedup.keep_latest(
            ev.unionByName(
                p.select(
                    key,
                    F.col("__pus").alias("us"),
                    F.col("__ptb").alias("tb"),
                    F.col("__pty").alias("ty"),
                )
            ),
            key,
            "us",
            tiebreak_col="tb",
        )
        late_rows = ev.join(p, key, "inner").filter(F.col("us") < F.col("__pus"))
        return CarriedEpoch(new_state=new_state, delta=delta, late_rows=late_rows)

    run_carried_epoch(
        batch_df,
        epoch_id,
        state_path,
        key,
        empty,
        compute,
        counts_fold=_fold_transition_counts,
        track_late=track_late,
        compact_every=compact_every,
    )


def transitions_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """Current Markov transition table from the count store: sum the
    committed deltas per (from_type, to_type) and score with the exact
    batch probability expression (`transition_probs`) — identical rows
    to event_transitions over everything the stream has seen, under the
    time-partitioned-per-key contract. Lazy: one additive aggregate over
    the store plus the bounded |types|^2 window."""
    counts = (
        read_artifact(spark, _counts_path(state_path))
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return transition_probs(counts)


def late_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """Out-of-order accounting: one row per epoch that processed events
    older than their key's carried last event — (epoch, n_late_events,
    n_late_keys). All-zero rows mean the time-partitioned-per-key
    contract held; nonzero rows name the epochs where arrival-order
    pairing may disagree with a batch re-run."""
    return read_late_counts(spark, state_path)


def start_transitions_stream(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    track_late: bool = True,
    compact_every: int | None = 64,
    available_now: bool = True,
):
    """Continuous journey monitoring over an event stream: per
    micro-batch, append the batch's transition-count delta (within-batch
    pairs + carried boundary pairs) and advance the per-key carried
    state; read the live Markov table any time with
    `transitions_snapshot`."""
    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_transitions_batch(
            batch_df, epoch_id, state_dir, key, type_col, time, tiebreak,
            track_late=track_late, compact_every=compact_every,
        )

    return start_carried_stream(
        events_stream, checkpoint_dir, process_batch, available_now
    )
