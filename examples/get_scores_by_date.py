"""One snapshot day (reference:
examples/get-scores-by-date-as-polars-dataframe.py) — a single pruned
partition read."""

from _common import demo_client

client = demo_client()
df = client.get_scores_by_date("2023-03-09")
df.show(10, truncate=False)
print(f"{df.count()} rows for 2023-03-09")
