"""Quick per-leg bench for optimization iteration: times selected
bench legs (same methodology as bench.py: noop sink, best-of-N) and
optionally counts the Spark jobs each leg submits.

Usage: python tools/bench_legs.py [leg ...]        # default: all bench legs
  env SPARK_GRAFT_BENCH_REPEATS=N   (default 4)
  env SPARK_GRAFT_SF_DIR=...        (default /root/testdata/sf0.1)

Prints one line per leg: name, best seconds, all samples, #jobs of the
last run (job count = fixed per-call overhead: eager probes, separate
broadcasts, AQE stage materializations all show up here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "4"))

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES
    from carbon_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="ccs-bench-legs")
    qs = {**entry.queries(), **entry.extra_queries()}
    legs = sys.argv[1:] or BENCH_QUERIES

    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in legs:
        fn = qs[name]
        sc.setJobDescription(f"bench:{name}")
        samples = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for i in range(repeats):
            if i == repeats - 1:
                jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        # job ids for the default group accumulate; count delta of last run
        jobs_after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        n_jobs = jobs_after - jobs_before
        best = min(samples)
        out[name] = best
        print(f"{best:8.3f}  jobs={n_jobs:<3d} {name:28s} samples={samples}", flush=True)
        sc.setJobDescription(None)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))


if __name__ == "__main__":
    main()
