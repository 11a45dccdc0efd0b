"""Quantized (changed-only) scores (reference:
examples/get-changed-scores-as-polars-dataframe.py and its one-cve /
multiple-cves variants) — the flagship lag-window plan."""

import sys

from _common import demo_client

from epss_spark.plans.query import Query

client = demo_client()
ids = tuple(a for a in sys.argv[1:]) or None
df = client.get_changed_scores(
    min_date="2023-03-08",
    max_date="2023-03-14",
    query=Query(ids=ids) if ids else None,
)
df.show(15, truncate=False)
print(f"{df.count()} change events")
