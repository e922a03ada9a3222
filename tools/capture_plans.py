"""Capture .explain("formatted") output for bench legs into
plans/r12/<leg>_<suffix>.txt (the optimization-round evidence files).

Usage: python tools/capture_plans.py <suffix> [leg ...]
  suffix: e.g. "before" or "after"
  default legs: every bench.py leg
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES
    from carbon_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="ccs-plan-capture")
    qs = {**entry.queries(), **entry.extra_queries()}
    legs = sys.argv[2:] or BENCH_QUERIES

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_SUBDIR", "r13"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in legs:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
