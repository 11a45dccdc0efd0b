"""Shared id-checksum audit sibling for the additive stream family.

Every additive store (kmeans sums, dim-drift sums, model-quality sums)
shares the same exactly-once-per-id input contract and therefore the
same audit need: prove the store absorbed EXACTLY the corpus, not just
the right NUMBER of rows. The audit state is one row per epoch in a
`<state_path>.ids` sibling — (n, __xs) where __xs is the XOR of each
id's 60-bit md5 — folded by the standard additive compaction. XOR is
order-free and overflow-free, and together with the count it detects
the count-neutral duplicate-plus-drop failures a bare total cannot
(see kmeans_stream.corpus_id_checksum for the multiset-equality
argument and the DuckDB-replayable spelling).

Streams that run with id_col=None simply never create the sibling; the
read side then reports the audit as UNAVAILABLE (None), never silently
passing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epss_spark.streaming.dedup_stream import (
    _list_artifact,
    _write_epoch,
    autocompact_epoch,
    read_artifact,
)

IDS_SUFFIX = ".ids"


def fold_ids(df: DataFrame) -> DataFrame:
    """Additive compaction for the audit sibling: counts summed,
    checksums XORed (both order-free)."""
    return df.groupBy().agg(
        F.sum("n").alias("n"),
        F.bit_xor("__xs").alias("__xs"),
        F.max("__epoch").alias("__epoch"),
    )


def write_id_audit_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    id_col: str,
    compact_every: int | None = 64,
) -> None:
    """Append one (n, id-hash XOR) row for this epoch to the `.ids`
    sibling — a pure function of the batch, so a foreachBatch replay
    overwrites `epoch-N/` with the identical recomputed row (the same
    idempotency contract as the main store's delta)."""
    from epss_spark.operators.dedup import _md5_60bit

    ids = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(_md5_60bit(F.col(id_col).cast("string"))).alias("__xs"),
    ).withColumn("__epoch", F.lit(int(epoch_id)))
    _write_epoch(ids, state_path + IDS_SUFFIX, epoch_id)
    autocompact_epoch(
        batch_df.sparkSession, state_path + IDS_SUFFIX, epoch_id, compact_every,
        transform=fold_ids,
    )


def read_id_checksum(spark: SparkSession, state_path: str) -> tuple[int, int] | None:
    """Fold the `.ids` sibling to the store's (count, id-hash XOR) —
    compare against kmeans_stream.corpus_id_checksum(corpus). Returns
    None when the sibling does not exist (stream ran with id_col=None):
    the audit is explicitly unavailable, never silently zero."""
    exists, _, _ = _list_artifact(spark, state_path + IDS_SUFFIX)
    if not exists:
        return None
    df = read_artifact(spark, state_path + IDS_SUFFIX)
    row = df.agg(
        F.sum("n").cast("long").alias("n"), F.bit_xor("__xs").cast("long").alias("x")
    ).collect()[0]
    return int(row["n"] or 0), int(row["x"] or 0)
