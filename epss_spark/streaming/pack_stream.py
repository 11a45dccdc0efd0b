"""Streaming incremental sequence packing — the continuous face of
prep.pack_sequences (a Spark-native extension; the reference is strictly
batch).

A tokenization pipeline consumes documents as they land and must emit
fixed-token-budget training sequences without repacking history. Like
dedup_stream, foreachBatch is the primitive: each micro-batch is packed by
the batch operator resumed from the persistent per-bucket state (the last
open bin and its fill — n_buckets tiny rows on parquet), packed rows land
epoch-scoped, and the state is committed per epoch.

Restart/retry idempotency (the dedup_stream design, module docstring
there): foreachBatch is at-least-once, so BOTH artifacts are epoch-scoped
— packed rows overwrite `<packed_dir>/epoch-N/`, and each epoch's
COMPLETE state (touched buckets advanced, untouched carried forward)
overwrites `<state_dir>/epoch-N/`. A replay of epoch N resumes from the
newest state with epoch < N — exactly what the first attempt saw — and
recomputes bit-identical rows that REPLACE the previous attempt's output
instead of appending a second copy into fresh bins. Read the packed
output with `dedup_stream.read_artifact` (plain spark.read.parquet
ignores epoch subdirs).

State is bounded by construction: exactly one (open_bin, open_fill) row
per bucket, independent of stream length — it rides through the driver
(a <= n_buckets-row collect, the same bounded-edge class as the IVF
centroid fetch). Micro-batches execute serially, so bin numbering
continues seamlessly: the stream's cumulative output is exactly what
sequential batch runs threading init_state by hand would produce (pinned
in tests/test_sinks_streaming.py, along with the replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from epss_spark.operators import prep
from epss_spark.streaming.dedup_stream import (  # noqa: F401  (same reader)
    _glob_escape,
    _hadoop_fs,
    _list_artifact,
    _write_epoch,
    autocompact_epoch,
    read_artifact,
    stream_documents,
)

_STATE_SCHEMA = "bucket long, open_bin long, open_fill long"


def read_pack_state(
    spark: SparkSession, state_dir: str, before_epoch: int | None = None
) -> DataFrame | None:
    """Load the per-bucket resume state, or None before the first batch.

    Each epoch dir holds the COMPLETE state as of that epoch, so the
    resume point is the single newest committed epoch — with
    `before_epoch` set (inside a foreachBatch), the newest epoch BELOW
    it, which makes a replay read exactly what the first attempt saw.
    Listing goes through the Hadoop FS API (`_list_artifact`), not
    os.path — a driver-local existence check would silently see nothing
    on hdfs://s3a:// stores and restart bin numbering from 0. A flat
    (non-epoch) layout — e.g. a batch-written seed state — is read
    as the pre-stream state."""
    exists, has_flat, epochs = _list_artifact(spark, state_dir)
    epochs = [(e, p) for e, p, _ in epochs]
    if before_epoch is not None:
        epochs = [(e, p) for e, p in epochs if e < before_epoch]
    if epochs:
        return spark.read.parquet(_glob_escape(max(epochs)[1]))
    if exists and has_flat:
        return spark.read.parquet(_glob_escape(state_dir))
    return None


def _write_pack_state(
    spark: SparkSession, state_dir: str, state: DataFrame, epoch_id: int
) -> None:
    # cut lineage through the driver (bounded: one row per bucket) so the
    # epoch write cannot race the read of the previous state
    rows = state.select("bucket", "open_bin", "open_fill").collect()
    _write_epoch(
        spark.createDataFrame(rows, _STATE_SCHEMA).coalesce(1), state_dir, epoch_id
    )


def process_pack_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    packed_dir: str,
    budget: int = 128,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
) -> None:
    """One idempotent epoch of incremental packing (module docstring for
    the replay argument). Module-level so tests can replay an epoch
    directly."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    init = read_pack_state(spark, state_dir, before_epoch=int(epoch_id))
    packed = prep.pack_sequences(
        batch_df,
        budget=budget,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        init_state=init,
    ).persist()
    try:
        _write_epoch(packed, packed_dir, epoch_id)
        # pass the SAME init state: a bucket whose last bin is the one
        # it resumed into must report init fill + batch fill
        new_state = prep.pack_state(packed, init_state=init)
        if init is not None:
            # carry forward buckets this batch didn't touch, so every
            # epoch dir holds the complete state
            untouched = init.join(
                new_state.select("bucket"), "bucket", "left_anti"
            )
            new_state = new_state.unionByName(untouched)
        _write_pack_state(spark, state_dir, new_state, epoch_id)
        # packed rows are append-only facts: fold committed epochs into
        # this one every `compact_every` epochs (replay-safe — see
        # autocompact_epoch). The STATE store needs no fold — each epoch
        # already holds the complete state — so it gets pure GC: drop
        # state epochs below the newest one committed BEFORE this epoch
        # (the resume point a replay of this epoch would read).
        if autocompact_epoch(spark, packed_dir, epoch_id, compact_every):
            _gc_pack_state(spark, state_dir, int(epoch_id))
    finally:
        packed.unpersist()


def _gc_pack_state(spark: SparkSession, state_dir: str, epoch_id: int) -> None:
    """Delete state epochs subsumed by the replay resume point: a replay
    of `epoch_id` resumes from the newest epoch < epoch_id, and every
    later reader resumes from something >= that — older dirs are
    unreachable. Idempotent (re-deleting is a no-op)."""
    _, _, epochs = _list_artifact(spark, state_dir)
    committed = [e for e, _, _ in epochs if e < epoch_id]
    if not committed:
        return
    keep = max(committed)
    jvm, fs = _hadoop_fs(spark, state_dir)
    for e, p, _ in epochs:
        if e < keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)


def start_incremental_pack(
    docs_stream: DataFrame,
    state_dir: str,
    packed_dir: str,
    checkpoint_dir: str,
    budget: int = 128,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
    available_now: bool = True,
):
    """Pack a document stream into training sequences incrementally: per
    micro-batch, resume each bucket's open bin from `state_dir`, commit
    (doc_id, bucket, bin, n_tokens) rows to `<packed_dir>/epoch-N/`, and
    commit the new open-bin state per epoch (replay-idempotent — module
    docstring). (bucket, bin) remains a globally consistent sequence id
    across the whole stream; read the output with `read_artifact`.

    available_now=True drains the backlog and stops (catch-up/nightly
    mode); False keeps consuming. Returns the StreamingQuery.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_pack_batch(
            batch_df, epoch_id, state_dir, packed_dir,
            budget, n_buckets, id_col, text_col,
            compact_every=compact_every,
        )

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
