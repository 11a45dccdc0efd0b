"""Structured Streaming ingest (SURVEY §2.12 — a Spark-native extension; the
reference is strictly batch, its "incremental" mode being idempotent
re-download of missing dates, reference epss/client.py:126-161).

The natural streaming shape for this domain: a file-source stream over the
snapshot directory (new daily files appear -> new micro-batch), watermarked
event-time aggregation for the volume/stats tables the reference planned in
NOTES.md:15-31, and applyInPandasWithState-free design — the quantization
delta itself stays a batch window (per-key history), while streams maintain
the per-day rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epss_spark.schemas import RAW_SNAPSHOT_SCHEMA
from epss_spark.functions.scalars import filename_date


def stream_scores(spark: SparkSession, path: str, fmt: str = "csv") -> DataFrame:
    """readStream over a snapshot directory; date recovered from filenames
    exactly as in the batch scan. One new file per day -> one micro-batch.
    The path is glob-escaped — Structured Streaming's file source globs
    like batch reads do (dedup_stream._glob_escape)."""
    from epss_spark.streaming.dedup_stream import _glob_escape

    path = _glob_escape(path)
    if fmt == "csv":
        df = (
            spark.readStream.schema(RAW_SNAPSHOT_SCHEMA)
            .option("header", True)
            .option("comment", "#")
            .option("maxFilesPerTrigger", 31)
            .csv(path)
        )
    elif fmt == "parquet":
        df = spark.readStream.schema(RAW_SNAPSHOT_SCHEMA).parquet(path)
    else:
        raise ValueError(f"unsupported stream format {fmt!r}")
    return df.withColumn("date", filename_date())


def daily_volume(scores: DataFrame) -> DataFrame:
    """Per-day snapshot volume stats (reference NOTES.md:15-31) as a
    streaming aggregation. Keyed by the snapshot date; late files are
    bounded by a 7-day watermark."""
    return (
        scores.withColumn("ts", F.col("date").cast("timestamp"))
        .withWatermark("ts", "7 days")
        .groupBy(F.window("ts", "1 day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_scores"),
            F.min("epss").alias("min_epss"),
            F.max("epss").alias("max_epss"),
            F.avg("epss").alias("mean_epss"),
        )
        .select(F.col("day.start").cast("date").alias("date"), "n_scores", "min_epss", "max_epss", "mean_epss")
    )


def daily_change_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming tumbling-window event counts with watermarked late-data
    handling over the events extension table. The events parquet has shipped
    ts as TIMESTAMP(NANOS) (read as long, truncated to micros) and as
    TIMESTAMP(MICROS); readStream needs an explicit schema, so probe the
    footer with a batch read (cheap, metadata-only) and mirror tables.py's
    dual handling.

    The two legacy-parquet configs are needed only for the schema PROBE;
    they are set, probed under, and restored to their prior values so
    building this query does not silently change how unrelated batch
    reads in the same session decode TIMESTAMP(NANOS). The explicit
    readStream schema below makes the stream itself independent of the
    session setting."""
    from pyspark.sql.types import LongType

    _probe_confs = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in _probe_confs}
    for k, v in _probe_confs.items():
        spark.conf.set(k, v)
    try:
        from epss_spark.streaming.dedup_stream import _glob_escape

        events_path = _glob_escape(events_path)
        ts_is_long = isinstance(
            spark.read.parquet(events_path).schema["ts"].dataType, LongType
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    if ts_is_long:
        raw = spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string,"
            " value double, props string"
        ).parquet(events_path)
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        ).parquet(events_path)
        ev = raw
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("day"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("day.start").cast("date").alias("date"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within the
    watermark horizon (`dropDuplicatesWithinWatermark`, the at-least-once ->
    effectively-once repair step in an ingest pipeline). State holds one
    entry per distinct key seen inside the horizon and is evicted as the
    watermark advances — bounded state, unlike a plain dropDuplicates on a
    stream, which accumulates keys forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 120,
    output_mode: str = "complete",
) -> None:
    """Drain all currently-available input into an in-memory table (test &
    backfill harness): availableNow processes the full backlog then stops.

    `output_mode`: "complete" for the aggregation streams (daily_volume,
    daily_change_counts); pass "append" for non-aggregating streams
    (dedup_stream, stateful.streaming_changed_values) — Spark rejects
    complete mode without a streaming aggregation. Raises TimeoutError
    (after stopping the query) if the backlog does not drain within
    `timeout_sec`, instead of silently returning a partial table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"run_to_memory({name!r}): backlog not drained in {timeout_sec}s"
        )
