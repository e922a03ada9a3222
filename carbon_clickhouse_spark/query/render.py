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


def integral(series: DataFrame) -> DataFrame:
    """Running total per series (Graphite ``integral``). Accumulates
    in DECIMAL so the running values are exact."""
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    s = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    return series.select("path", "time", s.alias("value"))


def group_by_node(
    series: DataFrame, node: int, func: str = "sum", exact: bool = True
) -> DataFrame:
    """Graphite ``groupByNode(node, func)``: collapse series whose
    paths share segment ``node`` — e.g. node=1 over
    ``ev.u1.click`` groups by ``u1`` across event types.

    Cross-series aggregation per timestamp; sums run in DECIMAL when
    ``exact`` (engine-stable)."""
    key = F.split(F.col("path"), r"\.").getItem(node).alias("path")
    v = F.col("value").cast("decimal(18,6)") if exact else F.col("value")
    grouped = series.select(key, "time", v.alias("v")).groupBy("path", "time")
    if func == "sum":
        out = grouped.agg(F.sum("v").alias("value"))
    elif func == "min":
        out = grouped.agg(F.min("v").alias("value"))
    elif func == "max":
        out = grouped.agg(F.max("v").alias("value"))
    elif func == "avg":
        out = grouped.agg(
            (F.sum("v").cast("double") / F.count("v")).alias("value")
        )
        return out.select("path", "time", "value")
    else:
        raise ValueError(f"unsupported func {func}")
    return out.select("path", "time", F.col("value").cast("double").alias("value"))


def scale(series: DataFrame, factor: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") * F.lit(factor)).alias("value")
    )


def offset(series: DataFrame, amount: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") + F.lit(amount)).alias("value")
    )
