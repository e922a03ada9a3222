"""Continuous windowed aggregation over the live point stream —
watermarked event-time rollup the reference deployment gets only
after ClickHouse merges parts.

The reference's read path is eventually-consistent on
GraphiteMergeTree merges; this operator computes the same per-
``(path, bucket)`` aggregates AS THE DATA ARRIVES with Structured
Streaming's native windowed aggregation:

- event time = the metric timestamp (not arrival time), so replayed
  or out-of-order chunks land in their true buckets;
- a watermark bounds state: points later than ``late_allowance``
  behind the stream's max event time are dropped from the live agg
  (they still reach the durable points table through the normal K1
  path — this is the dashboard's hot view, not the store);
- append output mode emits a bucket exactly once, when the watermark
  passes its end — downstream readers see only finalized buckets.

Semantics match ``operators.rollup`` for the four GraphiteMergeTree
functions (avg/sum/max/min); the first-match rule selection happens
at read time exactly like the batch path, so one stream serves any
rule set.

Scale shape: one shuffle on (path, window) with partial aggregation
map-side; state per key is one row of four numbers, bounded by
(active series x windows inside the watermark), and the watermark
expires state — a week of 10M series at 1-minute buckets never
accumulates beyond ``late_allowance`` worth of windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def continuous_rollup(
    points: DataFrame,
    precision_s: int = 60,
    late_allowance: str = "10 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Live per-(path, bucket) aggregates from a STREAMING points
    frame (path string, value double, ``time_col`` long epoch
    seconds). Returns a streaming frame
    ``(path, time, avg, sum, max, min, cnt)`` with ``time`` the
    bucket start — feed to ``writeStream`` (append mode)."""
    ts = F.timestamp_seconds(F.col(time_col)).alias("__ts")
    win = F.window("__ts", f"{int(precision_s)} seconds")
    return (
        points.select("path", "value", ts)
        .withWatermark("__ts", late_allowance)
        .groupBy("path", win)
        .agg(
            F.avg("value").alias("avg"),
            F.sum("value").alias("sum"),
            F.max("value").alias("max"),
            F.min("value").alias("min"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "path",
            F.unix_timestamp(F.col("window.start")).alias("time"),
            "avg",
            "sum",
            "max",
            "min",
            "cnt",
        )
    )
