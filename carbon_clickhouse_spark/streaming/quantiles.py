"""Continuous windowed quantile sketches over a live stream — the
AggregatingMergeTree-with-``quantileState`` pattern (a ClickHouse
materialized view folding quantile states per time bucket) on
Structured Streaming.

The mergeable quantile sketch
(:mod:`..operators.quantile_sketch`) stores nothing but per-bucket
COUNTS, so the streaming version needs NO custom state operator:
bucketize each value (pure JVM expressions), then run Spark's native
watermarked windowed count — the state store holds one long per
(group, window, occupied bucket), partial aggregation combines
map-side, and append mode emits each window's state rows exactly once
when the watermark finalizes it. Estimation over the stored rows is
the SAME :func:`..operators.quantile_sketch.quantile_merge` the batch
path uses — which is the point of mergeable states: hot windows
written by the stream and history written by batch jobs fold
together in one read.

Scale shape: one shuffle on (group, window, bucket) with map-side
combine; state per key is a single count, bounded by
(groups x windows inside the watermark x occupied buckets), and the
watermark expires it. Nothing sequential, nothing in Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.quantile_sketch import (
    DEFAULT_M,
    DEFAULT_SCALE,
    bucketize,
)


def streaming_quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    time_col: str = "ts",
    window: str = "1 minute",
    late_allowance: str = "10 minutes",
    scale: int = DEFAULT_SCALE,
    m: int = DEFAULT_M,
) -> DataFrame:
    """Per-(group, event-time window) mergeable quantile states from
    a STREAMING frame. Returns an append-mode stream of state rows
    ``(*group_cols, win_start, win_end, bucket, cnt, qs_scale,
    qs_m)`` — each window emitted exactly once, when the watermark
    passes its end. Feed the stored rows to
    :func:`..operators.quantile_sketch.quantile_merge` (grouping by
    any superset — per window, per day, per group overall) to
    estimate quantiles with the batch guarantee (relative error
    <= 2^-m).

    ``time_col`` must be a timestamp column (event time); late rows
    beyond ``late_allowance`` are dropped from the live view, same
    contract as :func:`.analytics.continuous_rollup`.
    """
    gcols = list(group_cols)
    src = df.select(
        *gcols, F.col(time_col).alias("__ts"), value_col
    ).withWatermark("__ts", late_allowance)
    bk = bucketize(src, value_col, scale, m)
    win = F.window("__ts", window)
    return (
        bk.groupBy(*gcols, win, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            *gcols,
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "bucket",
            "cnt",
            F.lit(int(scale)).cast("long").alias("qs_scale"),
            F.lit(int(m)).cast("int").alias("qs_m"),
        )
    )
