"""CVE watch-list + score-bound filtering (reference:
examples/get-scores-for-one-cve-by-date / multiple-cves variants)."""

from _common import demo_client

from epss_spark.plans.query import Query

client = demo_client()

one = client.get_scores_by_date("2023-03-09", query=Query(ids=("CVE-2023-7$",)))
print("one cve (regex mode, reference parity):")
one.show(5, truncate=False)

many = client.get_scores_by_date(
    "2023-03-09",
    query=Query(ids=("CVE-2023-7", "CVE-2023-8", "CVE-2023-9"), match="isin", min_value=0.0),
)
print("watch-list (exact mode) with a real 0.0 bound:")
many.show(5, truncate=False)
