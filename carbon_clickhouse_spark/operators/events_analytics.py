"""ClickHouse-style event analytics re-expressed as Spark window ops.

The reference engine stores into ClickHouse and leaves analytics to
ClickHouse's function library; ``windowFunnel`` and ``retention`` are
that library's signature event-sequence aggregates (public semantics:
ClickHouse docs, parametric-functions). This module provides the same
capabilities as pure DataFrame plans — one Exchange on the user key,
window functions inside whole-stage codegen, no Python in the loop.

windowFunnel here is the running-max DP: for a chain reaching step k,
a LATER chain start time is always at least as good (it can only relax
the window constraint for deeper steps), so the exists-a-chain
semantics reduce to, per event, the running maximum over strictly
preceding rows of the best chain-start reaching the previous step.
That is exactly N window functions over one partitioning+sort — no
per-user UDF, no self-joins, no state store.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window: int,
    time_col: str = "time",
    type_col: str = "event_type",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user maximum funnel depth: the largest ``k`` such that some
    events of types ``steps[0..k-1]`` occur in strictly increasing row
    order with ``t_k - t_1 <= window`` (same units as ``time_col``,
    which must be numeric — epoch seconds/micros).

    Returns ``(user_col, funnel_level int)`` with one row per user
    that has ANY event (level 0 = none of ``steps[0]`` seen).

    Semantics match ClickHouse ``windowFunnel(window)(t, cond1, ...)``
    in its default mode, with deterministic ordering: events are
    ordered by ``(time_col, tiebreak_col)`` and a step may only chain
    to an event on an earlier row, so equal-timestamp chains resolve
    by the tiebreak rather than engine-dependent input order.

    Scale shape: one Exchange on ``user_col``; all ``len(steps)``
    window passes share that partitioning and sort, so Catalyst plans
    a single shuffle + sort with chained Window operators, each in
    codegen. Cost is O(events) rows shuffled once — no join, no
    explode, no per-user collect.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    order = [F.col(time_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(
        user_col, time_col, type_col, *([tiebreak_col] if tiebreak_col else [])
    )
    t = F.col(time_col)
    # __s{k}: the best (latest) chain start among chains that reach
    # step k AT this event; __m{k}: running max of __s{k} over strictly
    # preceding rows, i.e. the best start available to the next step.
    df = df.withColumn(
        "__s1", F.when(F.col(type_col) == steps[0], t)
    )
    for k in range(2, len(steps) + 1):
        df = df.withColumn(f"__m{k - 1}", F.max(f"__s{k - 1}").over(prev))
        df = df.withColumn(
            f"__s{k}",
            F.when(
                (F.col(type_col) == steps[k - 1])
                & (t - F.col(f"__m{k - 1}") <= window),
                F.col(f"__m{k - 1}"),
            ),
        )
    level = F.lit(0)
    for k in range(1, len(steps) + 1):
        level = F.when(F.col(f"__s{k}").isNotNull(), k).otherwise(level)
    return (
        df.withColumn("__lvl", level)
        .groupBy(user_col)
        .agg(F.max("__lvl").cast("int").alias("funnel_level"))
    )


def retention_cohorts(
    events: DataFrame,
    anchor_type: str,
    offsets: Sequence[int] = (0, 1, 3, 7, 14),
    date_col: str = "date",
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention (ClickHouse ``retention(cond0, cond1, ...)``
    rolled up by cohort): anchor each user on the DATE of their first
    ``anchor_type`` event; for each requested day offset, count how
    many cohort members had any event exactly that many days later.

    Returns ``(cohort date, day_offset int, n_active long)`` — one row
    per (cohort, offset) with at least one active user; offset 0 is
    the cohort size (the anchor day itself counts as activity).

    Scale shape: the anchor table is one groupBy(user) min-date; the
    activity table is distinct (user, date); their equi-join shuffles
    on the user key (both sides large — a broadcast would be wrong at
    corpus scale, so none is hinted), then one groupBy on the tiny
    (cohort, offset) key with partial aggregation.
    """
    anchors = (
        events.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.min(date_col).alias("__cohort"))
    )
    activity = events.select(user_col, F.col(date_col).alias("__d")).distinct()
    offs = [int(o) for o in offsets]
    joined = anchors.join(activity, user_col).withColumn(
        "__off", F.datediff(F.col("__d"), F.col("__cohort"))
    )
    return (
        joined.filter(F.col("__off").isin(offs))
        .groupBy(F.col("__cohort").alias("cohort"), F.col("__off").cast("int").alias("day_offset"))
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
