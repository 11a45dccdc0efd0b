"""Dense scores over a date range (reference:
examples/get-scores-as-polars-dataframe.py)."""

from _common import demo_client

client = demo_client()
df = client.get_scores(min_date="2023-03-08", max_date="2023-03-10")
df.show(10, truncate=False)
print(f"{df.count()} rows")
