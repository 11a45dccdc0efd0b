"""SparkSession factory tuned for this engine.

Local-mode defaults are sized by env vars the driver harness sets:
``SPARK_GRAFT_CPUS`` (local parallelism) and ``SPARK_GRAFT_SF_DIR``
(testdata location). On a real cluster the same builder settings apply —
AQE re-plans shuffles at runtime, so `spark.sql.shuffle.partitions` here is
an upper bound that AQE coalesces, not a hand-tuned constant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(app_name: str = "epss-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
      which is what makes one static config survive a 100x scale-up.
    - UTC session timezone: timestamp semantics independent of host TZ
      (required for cross-engine oracle parity).
    - Arrow on: vectorized toPandas / pandas_udf transfers.
    """
    # Python workers (mapInPandas / applyInPandasWithState) unpickle
    # functions that reference this package by module name; make sure the
    # repo root is importable in workers regardless of the caller's cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + existing if existing else "")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing: shuffles coalesce down to the
        # cluster's parallelism floor, never below it. Size-based coalescing
        # (parallelismFirst=false, advisory 32m) measured 2-5x slower on the
        # flagship window at bench scale: a 10M-row shuffle compresses to
        # ~100MB and collapsed to ~4 tasks, idling 28 of 32 cores in the
        # CPU-bound window sort. minPartitionSize=1m still merges the truly
        # tiny sf0.001 shuffles; at 100 TB the advisory size governs because
        # shuffle bytes vastly exceed parallelism x 32m.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus or "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.

    The correctness driver owns its own SparkSession; these settings are the
    subset that matters for deterministic results (TZ) and good local plans,
    and are safe to set post-construction.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
    return spark
