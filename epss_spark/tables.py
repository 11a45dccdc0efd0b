"""Testdata loaders (TESTDATA.md): one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/. Plain `spark.read.parquet` — Catalyst
gets column pruning + predicate pushdown for free on these scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from epss_spark.schemas import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # events.parquet `ts` has shipped as TIMESTAMP(NANOS) (which the
        # Spark parquet reader rejects) and as TIMESTAMP(MICROS) without
        # isAdjustedToUTC (which Spark 4 infers as TIMESTAMP_NTZ, rejected
        # by unix_micros and friends). Handle both: read nanos as long and
        # truncate — bit-identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP
        # conversion — and disable NTZ inference so micros arrive as plain
        # TIMESTAMP at the scan (pushdown on ts preserved; the session
        # timezone is pinned UTC, so the instant matches DuckDB's naive
        # reading). The NTZ cast below is a belt-and-braces fallback.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL surface
    (reference: epss/util.py:55-66 — register + execute SQL)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
