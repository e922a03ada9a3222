"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query materializes via the noop sink (full compute, no driver
collect) so the timing covers scan -> transform -> shuffle, not
result serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "points_ingest",
    "points_reverse",
    "index_table",
    "tagged_table",
    "series_dedup",
    "rollup_all",
    "read_series",
    "tpch_q1",
    "top_revenue_orders",
    "dedup_exact",
    "text_features",
    "token_counts",
    "minhash_lsh_pairs",
    "simhash",
    "ann_topk",
    "cosine_pairs",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from carbon_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="ccs-bench")
    qs = entry.queries()

    # warm the JVM/session (scan metadata, codegen) outside the clock
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # best of 2 runs: the first pays one-time plan compilation + stage
    # warmup, the second is the steady-state throughput that scales
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # storage path: write the four-table contract once, then time the
    # read queries a graphite-web-shaped client would issue
    import shutil
    import tempfile

    import __spark_entry__ as entry_mod
    from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables, write_tables
    from carbon_clickhouse_spark.query.finder import find_metrics, read_series

    root = tempfile.mkdtemp(prefix="ccs_bench_")
    try:
        from carbon_clickhouse_spark.pipeline import ingest_and_store

        t0 = time.perf_counter()
        pts = entry_mod._events_points(spark, sf_dir)
        ingest_and_store(pts, root, IngestConfig())
        timings["store_tables"] = round(time.perf_counter() - t0, 3)

        stored_points = spark.read.parquet(f"{root}/points")
        stored_index = spark.read.parquet(f"{root}/index")

        t0 = time.perf_counter()
        find_metrics(stored_index, "ev.u1*.*").write.format("noop").mode(
            "overwrite"
        ).save()
        timings["stored_find_metrics"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        read_series(
            stored_points,
            ["ev.u1.click", "ev.u2.view", "ev.u3.error"],
            1704067200,
            1706745600,
            precision_s=3600,
        ).write.format("noop").mode("overwrite").save()
        timings["stored_read_series"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # the reference's KPI: ingest throughput. points_ingest parses
    # 2 lines per event (plain + tagged), so points/s = 2n / t.
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pps = round(2 * n_events / timings["points_ingest"])

    # sustained STREAMING ingest: land line files, run the
    # foreachBatch four-table pipeline until drained
    stream_pps = _stream_throughput(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ingest_points_per_sec": pps,
                "streaming_points_per_sec": stream_pps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


def _stream_throughput(spark, sf_dir: str) -> int:
    """End-to-end streaming rate: protocol lines -> parse -> drop
    rules -> four tables, through the real foreachBatch pipeline."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from carbon_clickhouse_spark.pipeline import IngestConfig
    from carbon_clickhouse_spark.streaming.ingest import (
        StreamConfig,
        file_landing_source,
        start_plain_ingest,
    )

    base = tempfile.mkdtemp(prefix="ccs_stream_")
    landing = os.path.join(base, "landing")
    root = os.path.join(base, "tables")
    os.makedirs(landing)
    try:
        ev = entry_mod._t(spark, sf_dir, "events")
        sec = entry_mod._sec(ev)
        lines = ev.select(
            F.concat(
                entry_mod._plain_path(),
                F.lit(" "),
                F.col("value").cast("string"),
                F.lit(" "),
                sec.cast("string"),
            ).alias("value")
        )
        n = lines.count()

        # untimed warm-up: a small stream through the same pipeline so
        # the measured run reports SUSTAINED throughput, not the
        # one-time streaming-machinery startup (observed 2.5x skew)
        warm_landing = os.path.join(base, "warm_landing")
        warm_root = os.path.join(base, "warm_tables")
        os.makedirs(warm_landing)
        lines.limit(20000).coalesce(2).write.mode("overwrite").text(warm_landing)
        wq = start_plain_ingest(
            spark,
            file_landing_source(spark, warm_landing),
            StreamConfig(
                root=warm_root,
                chunk_interval="500 milliseconds",
                ingest=IngestConfig(),
                audit_dropped=False,
                exists_cache=True,
            ),
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(
                        os.path.join(warm_root, "points")
                    ).count() >= 20000:
                        break
                except Exception:
                    pass
                time.sleep(0.25)
        finally:
            wq.stop()

        # two chunk files (two micro-batches)
        lines.coalesce(2).write.mode("overwrite").text(landing)

        cfg = StreamConfig(
            root=root,
            chunk_interval="500 milliseconds",
            ingest=IngestConfig(),
            audit_dropped=False,
            exists_cache=True,
        )
        t0 = time.perf_counter()
        q = start_plain_ingest(spark, file_landing_source(spark, landing), cfg)
        try:
            deadline = time.time() + 300
            while time.time() < deadline:
                try:
                    if spark.read.parquet(os.path.join(root, "points")).count() >= n:
                        break
                except Exception:
                    pass
                time.sleep(0.25)
            elapsed = time.perf_counter() - t0
        finally:
            q.stop()
        return round(n / elapsed)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
