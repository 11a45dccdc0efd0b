"""Incremental journey n-gram mining — path_ngrams as a stream.

The batch operator (operators/sessionize.py::path_ngrams) slides a
length-n window over each session's ordered event types. A gram spans n
CONSECUTIVE in-session events, so the only cross-batch context a new
event can ever need is its key's last n-1 events — carried forward as
keep-latest state — plus their timestamps (the gap rule re-evaluates
over the carried suffix exactly because original times ride along; a
session boundary older than the carried window cannot affect any gram
that ends at a new event). Each micro-batch therefore:

1. explodes the carried suffix back into synthetic rows, unions the
   batch's events, and re-runs the same gap-sessionize + slide the
   batch operator uses;
2. keeps ONLY grams whose LAST element is a batch event — grams ending
   inside the carried suffix were already counted by the epoch that
   carried them, which makes the per-epoch delta exact (not
   approximate) under the ordering contract;
3. appends the (gram, n) count delta epoch-scoped (additive store,
   burst/transitions precedent) and advances the carried suffix to the
   union's last n-1 events per key.

Ordering contract: batches time-partitioned per key, same as the funnel
and transitions streams; out-of-order events are counted per epoch in
the `.late` sibling (`late_counts`). Replays are idempotent: epoch N
reads state as of N-1 and recomputes bit-identical deltas.

Snapshot semantics: `ngrams_snapshot` returns (gram, n) — occurrence
counts identical to the batch `path_ngrams` over everything seen. The
batch operator's n_sessions column (distinct containing sessions) is
deliberately NOT maintained: session identity is not stable across
micro-batches without carrying every session's full gram SET per key,
which is unbounded state. Run the batch operator over the corpus when
per-session containment is needed.

State size: one row per key holding at most n-1 events, keep-latest
maintained and auto-compacted; the counts store is bounded by distinct
motifs per epoch. Both stay O(compact_every) epoch dirs per read for
the stream's whole lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epss_spark.streaming.carried_state import (
    CarriedEpoch,
    counts_path as _counts_path,
    run_carried_epoch,
    start_carried_stream,
)
from epss_spark.streaming.dedup_stream import read_artifact, read_late_counts


def _fold_counts(df: DataFrame) -> DataFrame:
    """Additive compaction transform (burst_stream precedent): one row
    per gram, max(__epoch) keeps folded rows attributed to a committed
    epoch so the replay filter stays exact."""
    return df.groupBy("gram").agg(
        F.sum("n").alias("n"), F.max("__epoch").alias("__epoch")
    )


def process_ngrams_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    n: int = 3,
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    sep: str = ">",
    track_late: bool = True,
    compact_every: int | None = 64,
) -> None:
    """One idempotent epoch: re-run the gap-sessionize + n-gram slide
    over (carried suffix union batch), count only grams ENDING at a
    batch event, append the additive delta and the advanced suffix
    epoch-scoped. Scale shape per batch: one key exchange shared by the
    sessionize windows and the per-session aggregate (the shell
    restricts the carried state to keys TOUCHED by this batch —
    untouched keys' suffixes persist across epochs via the keep-latest
    read, so per-epoch state writes are O(touched keys), never O(total
    keys)), one bounded gram aggregate, one keep-latest suffix aggregate
    — no store-wide scan. Store layout, replay idempotency, late
    accounting, and compaction are the shared carried-state shell
    (streaming/carried_state.py)."""
    if int(n) < 1:
        raise ValueError(f"process_ngrams_batch: n must be >= 1, got {n}")
    key_t = batch_df.schema[key].dataType.simpleString()
    tb_t = batch_df.schema[tiebreak].dataType.simpleString()
    ty_t = batch_df.schema[type_col].dataType.simpleString()
    seq_t = f"array<struct<us:bigint,tb:{tb_t},ty:{ty_t}>>"
    empty = f"`{key}` {key_t}, seq {seq_t}, __epoch long"

    def compute(prior: DataFrame, batch: DataFrame) -> CarriedEpoch:
        carried = prior.select(
            F.col(key), F.explode("seq").alias("__e")
        ).select(
            key,
            F.col("__e.us").alias("us"),
            F.col("__e.tb").alias("tb"),
            F.col("__e.ty").alias("ty"),
            F.lit(1).alias("__carried"),
        )
        ev = batch.select(
            F.col(key),
            F.unix_micros(F.col(time)).alias("us"),
            F.col(tiebreak).alias("tb"),
            F.col(type_col).alias("ty"),
            F.lit(0).alias("__carried"),
        )
        allev = carried.unionByName(ev)

        # the batch operator's gap-sessionize, over integer micros
        # (original timestamps ride in the carried suffix, so gaps
        # inside the union are the TRUE gaps)
        w = Window.partitionBy(key).orderBy(F.col("us").asc(), F.col("tb").asc())
        prev_us = F.lag("us").over(w)
        st = (
            prev_us.isNull()
            | ((F.col("us") - prev_us) > int(gap_seconds) * 1_000_000)
        ).cast("int")
        sid = F.sum(st).over(w.rowsBetween(Window.unboundedPreceding, 0))
        s = allev.withColumn("__sid", sid)
        per_session = s.groupBy(key, "__sid").agg(
            F.array_sort(
                F.collect_list(F.struct("us", "tb", "ty", "__carried"))
            ).alias("seq")
        )
        seq = F.col("seq")
        idx = F.when(
            F.size(seq) >= int(n), F.sequence(F.lit(1), F.size(seq) - int(n) + 1)
        ).otherwise(F.array().cast("array<int>"))
        grams = per_session.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.array_join(
                            F.transform(F.slice(seq, i, int(n)), lambda x: x["ty"]),
                            sep,
                        ).alias("gram"),
                        # a gram is NEW iff its last element is a batch event
                        F.element_at(seq, (i + int(n) - 1).cast("int"))[
                            "__carried"
                        ].alias("__last_carried"),
                    ),
                )
            ).alias("g")
        )
        delta = (
            grams.filter(F.col("g.__last_carried") == 0)
            .groupBy(F.col("g.gram").alias("gram"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

        # advanced suffix: the union's last n-1 events per key (n=1
        # keeps an empty suffix — single-event grams need no cross-batch
        # context)
        tail = F.array_sort(F.collect_list(F.struct("us", "tb", "ty")))
        keep = int(n) - 1
        new_seq = (
            F.when(F.size(tail) > keep, F.slice(tail, -keep, keep)).otherwise(tail)
            if keep > 0
            else F.slice(tail, 1, 0)
        )
        new_state = allev.groupBy(key).agg(new_seq.alias("seq"))

        # size guard: n=1 stores carry EMPTY suffixes (single-event
        # grams need no cross-batch context) — element_at(-1) on an
        # empty array throws, and an empty suffix has no ordering
        # contract to violate anyway
        last_us = prior.select(
            key,
            F.when(
                F.size("seq") > 0, F.element_at("seq", -1)["us"]
            ).alias("__pus"),
        ).filter(F.col("__pus").isNotNull())
        late_rows = ev.join(last_us, key, "inner").filter(
            F.col("us") < F.col("__pus")
        )
        return CarriedEpoch(new_state=new_state, delta=delta, late_rows=late_rows)

    run_carried_epoch(
        batch_df,
        epoch_id,
        state_path,
        key,
        empty,
        compute,
        counts_fold=_fold_counts,
        track_late=track_late,
        compact_every=compact_every,
    )


def ngrams_snapshot(
    spark: SparkSession, state_path: str, include_n_sessions: bool = False
) -> DataFrame:
    """Current motif counts from the store: (gram, n), identical to the
    batch path_ngrams occurrence counts over everything the stream has
    seen under the time-partitioned-per-key contract (module docstring
    for why n_sessions is batch-only). Lazy: one additive aggregate.

    `include_n_sessions=True` appends an all-NULL `n_sessions` column
    for drop-in schema compatibility with the batch operator — NULL,
    not a number, so a consumer aggregating it gets NULL instead of a
    silently wrong containment count (DEPLOYMENT §streams)."""
    out = (
        read_artifact(spark, _counts_path(state_path))
        .groupBy("gram")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    if include_n_sessions:
        out = out.withColumn("n_sessions", F.lit(None).cast("long"))
    return out


def late_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """Out-of-order accounting: (epoch, n_late_events, n_late_keys) for
    batch events older than their key's carried suffix — nonzero rows
    name epochs where arrival-order gram formation may disagree with a
    batch re-run."""
    return read_late_counts(spark, state_path)


def start_ngrams_stream(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    key: str = "user_id",
    type_col: str = "event_type",
    time: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    sep: str = ">",
    track_late: bool = True,
    compact_every: int | None = 64,
    available_now: bool = True,
):
    """Continuous journey-motif monitoring: per micro-batch, append the
    batch's new-gram count delta (grams ending at a batch event) and
    advance each key's carried (n-1)-event suffix; read the live motif
    table any time with `ngrams_snapshot`."""
    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_ngrams_batch(
            batch_df, epoch_id, state_dir, n, key, type_col, time, tiebreak,
            gap_seconds, sep, track_late=track_late,
            compact_every=compact_every,
        )

    return start_carried_stream(
        events_stream, checkpoint_dir, process_batch, available_now
    )
