"""Model-version epoch ranges (reference:
examples/get-date-range-by-model-version.py)."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark.client import get_date_range

for version in ("v1", "v2", "v3"):
    lo, hi = get_date_range(version, max_date_resolver=lambda: dt.date(2024, 1, 31))
    print(f"{version}: {lo.isoformat()} .. {hi.isoformat()}")
