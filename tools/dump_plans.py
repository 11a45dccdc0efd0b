"""Dump `.explain("formatted")` for driver-surface queries into
plans/r15/<query>_<tag>.txt — the optimization round's before/after plan
evidence (guide §1: capture the plan shape for every query you touch).

    python tools/dump_plans.py before [query ...]   # default: all surface
    python tools/dump_plans.py after  query ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epss_spark import registry
from epss_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    surface = registry.get_queries()
    targets = names or list(surface)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in targets:
        fn = surface.get(name) or registry.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        df = fn(spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted)
        print(f"OK   {name} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
