"""Shared demo-dataset builder for the examples (offline stand-in for the
live EPSS endpoint the reference examples hit)."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark.client import EPSSClient
from epss_spark.session import get_spark

SCORES_PATH = os.environ.get(
    "SCORES_PATH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "example_scores"),
)
MAX_DATE = dt.date(2023, 3, 20)


def demo_client():
    spark = get_spark("epss-spark-examples")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(SCORES_PATH, "_SUCCESS")):
        from pyspark.sql import functions as F

        n_days, n_cves = 14, 2000
        dense = (
            spark.range(n_cves)
            .withColumn("cve", F.concat(F.lit("CVE-2023-"), F.col("id")))
            .crossJoin(
                spark.range(n_days).select(
                    F.date_add(F.lit("2023-03-07").cast("date"), F.col("id").cast("int")).alias("date")
                )
            )
            .withColumn("h", F.abs(F.xxhash64("cve", "date")) % 100)
            .withColumn(
                "epss",
                F.when(F.col("h") < 20, (F.abs(F.xxhash64("cve", "date", F.lit(1))) % 100000) / 100000.0)
                .otherwise((F.abs(F.xxhash64("cve")) % 100000) / 100000.0),
            )
            .withColumn("percentile", F.lit(0.5))
            .select("date", "cve", "epss", "percentile")
        )
        dense.write.mode("overwrite").partitionBy("date").parquet(SCORES_PATH)
        open(os.path.join(SCORES_PATH, "_SUCCESS"), "a").close()
    return EPSSClient(spark, SCORES_PATH, max_date_resolver=lambda: MAX_DATE)
