"""Continuous windowed distinct-count states over a live stream —
the AggregatingMergeTree-with-``uniqState`` materialized-view pattern
(ClickHouse ``uniqState`` per time bucket, ``uniqMerge`` at read
time) on Structured Streaming.

Like :mod:`.quantiles`, this needs NO custom state operator: Spark's
native DataSketches HLL aggregate (``hll_sketch_agg``) runs inside a
watermarked windowed aggregation — partial sketches combine map-side,
the state store holds one ~2^lg_k-byte sketch per (group, window),
and append mode emits each window's state exactly once when the
watermark finalizes it. The emitted binary states are the SAME
mergeable form :func:`..operators.ch_aggregates.uniq_merge` folds, so
hot stream windows and batch-built history combine in one read
without rescanning values.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def streaming_uniq_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    time_col: str = "ts",
    window: str = "1 minute",
    late_allowance: str = "10 minutes",
    lg_k: int = 12,
    sketch_col: str = "uniq_state",
) -> DataFrame:
    """Per-(group, event-time window) mergeable HLL states from a
    STREAMING frame. Returns an append-mode stream
    ``(*group_cols, win_start, win_end, <sketch_col> binary)`` — each
    window emitted exactly once. Fold stored rows with
    :func:`..operators.ch_aggregates.uniq_merge` grouped by any
    superset (per window, per day, per group overall).

    NULL values are skipped (ClickHouse ``uniq*`` semantics);
    ``time_col`` must be a timestamp column (event time), and rows
    later than ``late_allowance`` are dropped from the live view —
    same contract as :func:`.analytics.continuous_rollup`.
    """
    gcols = list(group_cols)
    src = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *gcols,
            F.col(time_col).alias("__ts"),
            F.col(value_col).cast("string").alias("__v"),
        )
        .withWatermark("__ts", late_allowance)
    )
    win = F.window("__ts", window)
    return (
        src.groupBy(*gcols, win)
        .agg(F.hll_sketch_agg("__v", F.lit(lg_k)).alias(sketch_col))
        .select(
            *gcols,
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            sketch_col,
        )
    )
