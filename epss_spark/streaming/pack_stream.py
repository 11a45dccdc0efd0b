"""Streaming incremental sequence packing — the continuous face of
prep.pack_sequences (a Spark-native extension; the reference is strictly
batch).

A tokenization pipeline consumes documents as they land and must emit
fixed-token-budget training sequences without repacking history. Like
dedup_stream, foreachBatch is the primitive: each micro-batch is packed by
the batch operator resumed from the persistent per-bucket state (the last
open bin and its fill — n_buckets tiny rows on parquet), packed rows are
appended, and the state is rewritten for the next batch.

State is bounded by construction: exactly one (open_bin, open_fill) row
per bucket, independent of stream length — it rides through the driver
(a <= n_buckets-row collect, the same bounded-edge class as the IVF
centroid fetch) so the state overwrite never reads from the path it is
replacing. Micro-batches execute serially, so bin numbering continues
seamlessly: the stream's cumulative output is exactly what sequential
batch runs threading init_state by hand would produce (pinned in
tests/test_sinks_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from epss_spark.operators import prep
from epss_spark.streaming.dedup_stream import stream_documents  # noqa: F401  (same reader)

_STATE_SCHEMA = "bucket long, open_bin long, open_fill long"


def read_pack_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Load the per-bucket resume state, or None before the first batch."""
    if not os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        return None
    return spark.read.parquet(state_dir)


def _write_pack_state(spark: SparkSession, state_dir: str, state: DataFrame) -> None:
    # cut lineage through the driver (bounded: one row per bucket) so the
    # overwrite cannot race the read of the previous state
    rows = state.select("bucket", "open_bin", "open_fill").collect()
    spark.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(state_dir)


def start_incremental_pack(
    docs_stream: DataFrame,
    state_dir: str,
    packed_dir: str,
    checkpoint_dir: str,
    budget: int = 128,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Pack a document stream into training sequences incrementally: per
    micro-batch, resume each bucket's open bin from `state_dir`, append
    (doc_id, bucket, bin, n_tokens) rows to `packed_dir`, and store the new
    open-bin state. (bucket, bin) remains a globally consistent sequence id
    across the whole stream.

    available_now=True drains the backlog and stops (catch-up/nightly
    mode); False keeps consuming. Returns the StreamingQuery.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        init = read_pack_state(spark, state_dir)
        packed = prep.pack_sequences(
            batch_df,
            budget=budget,
            n_buckets=n_buckets,
            id_col=id_col,
            text_col=text_col,
            init_state=init,
        ).persist()
        try:
            packed.write.mode("append").parquet(packed_dir)
            # pass the SAME init state: a bucket whose last bin is the one
            # it resumed into must report init fill + batch fill
            new_state = prep.pack_state(packed, init_state=init)
            if init is not None:
                # carry forward buckets this batch didn't touch
                untouched = init.join(
                    new_state.select("bucket"), "bucket", "left_anti"
                )
                new_state = new_state.unionByName(untouched)
            _write_pack_state(spark, state_dir, new_state)
        finally:
            packed.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
