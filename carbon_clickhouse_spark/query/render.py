"""Graphite render-style series transforms.

The reference's companion stack (graphite-web / carbonapi) applies
these per-series functions after the table read; users switching to
this engine keep their daily vocabulary: derivative, perSecond,
nonNegativeDerivative, movingAverage, summarize (= rollup with an
explicit function), scale/offset.

All are window expressions over ``(path, time)`` — one shuffle per
series partition, ordered evaluation, no UDFs. Counters wrap exactly
like Graphite: nonNegativeDerivative emits NULL on resets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.rollup import RollupRule, rollup


def _w():
    return Window.partitionBy("path").orderBy("time")


def derivative(series: DataFrame) -> DataFrame:
    """value - previous value per series (first point -> NULL)."""
    return series.select(
        "path",
        "time",
        (F.col("value") - F.lag("value").over(_w())).alias("value"),
    )


def non_negative_derivative(series: DataFrame) -> DataFrame:
    """Like derivative but counter resets (negative deltas) -> NULL."""
    d = F.col("value") - F.lag("value").over(_w())
    return series.select(
        "path", "time", F.when(d >= 0, d).alias("value")
    )


def per_second(series: DataFrame) -> DataFrame:
    """Rate: delta value / delta time (the counter -> rate transform)."""
    dv = F.col("value") - F.lag("value").over(_w())
    dt = F.col("time") - F.lag("time").over(_w())
    rate = F.when((dv >= 0) & (dt > 0), dv / dt)
    return series.select("path", "time", rate.alias("value"))


def moving_average(series: DataFrame, points: int = 5) -> DataFrame:
    """Trailing moving average over the last ``points`` samples.

    Sums in DECIMAL over the frame (exact, engine-independent) and
    divides by the frame row count.
    """
    frame = _w().rowsBetween(-(points - 1), 0)
    s = F.sum(F.col("value").cast("decimal(18,6)")).over(frame).cast("double")
    n = F.count("value").over(frame)
    return series.select("path", "time", (s / n).alias("value"))


def summarize(
    series: DataFrame, interval_s: int, func: str = "sum", exact: bool = True
) -> DataFrame:
    """Graphite ``summarize(series, interval, func)`` == a one-rule
    rollup at fixed precision."""
    return rollup(
        series,
        (RollupRule("", func),),
        precision_s=interval_s,
        exact_decimal=exact,
        round_avg_to=4 if (exact and func == "avg") else None,
    )


def scale(series: DataFrame, factor: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") * F.lit(factor)).alias("value")
    )


def offset(series: DataFrame, amount: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") + F.lit(amount)).alias("value")
    )
