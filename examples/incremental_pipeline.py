"""The realistic daily job at scale: append-only quantization.

Instead of re-quantizing the whole dense history every day (the reference
re-reads every daily file), the quantized store — ~1% of the matrix — is
the only state: each new day's snapshot diffs against a per-key seed drawn
from the store, and the result appends. The invariant
`store ∪ incremental == full re-quantization` is pinned in
tests/test_quantize.py::test_incremental_equals_full.

Usage: python examples/incremental_pipeline.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import MAX_DATE, SCORES_PATH, demo_client  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators.quantize import changed_scores, incremental_changed_scores  # noqa: E402


def main() -> None:
    client = demo_client()
    spark = client.spark
    dense = spark.read.parquet(SCORES_PATH)

    boundary = MAX_DATE - dt.timedelta(days=3)
    # bootstrap: the quantized store through `boundary`
    store = changed_scores(dense.filter(F.col("date") <= F.lit(boundary)))
    print(f"store rows through {boundary}: {store.count()}")

    # the daily job: only the new days flow through the window. raw_tail is
    # the boundary-day raw snapshot — it seeds each key from its last RAW
    # row, so a NULL-valued score at the boundary still restarts correctly
    # (the change store alone cannot represent "last raw value was NULL")
    new_days = dense.filter(F.col("date") > F.lit(boundary))
    appended = incremental_changed_scores(
        store,
        new_days,
        since=boundary,
        raw_tail=dense.filter(F.col("date") == F.lit(boundary)),
    )
    print(f"new change events after {boundary}: {appended.count()}")

    # invariant check (what the golden test pins): store + appended == full
    full = changed_scores(dense).filter(F.col("date") > F.lit(boundary))
    assert appended.count() == full.count()
    print("invariant holds: store ∪ incremental == full re-quantization")


if __name__ == "__main__":
    main()
