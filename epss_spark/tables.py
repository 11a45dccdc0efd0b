"""Testdata loaders (TESTDATA.md): one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/. Plain `spark.read.parquet` — Catalyst
gets column pruning + predicate pushdown for free on these scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from epss_spark.schemas import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which the Spark parquet
        # reader rejects. Read nanos as long and truncate to microseconds —
        # bit-identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP conversion.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL surface
    (reference: epss/util.py:55-66 — register + execute SQL)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
