"""As-of (last-known-value) join — the time-series alignment primitive
Spark has no native operator for.

Aligns each left-side point with the most recent right-side value at
or before its timestamp (backward inclusive, pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics), per series. The graphite-shaped
use case: aligning a divisor series onto a dividend's timestamps
(``divideSeries`` between series sampled on different grids), or
joining point streams with slowly-changing reference values.

Implementation is the union-tag formulation, NOT a range join: tag
both sides, union, and forward-fill the right value with one
``last(ignorenulls)`` window per series key. One shuffle on the
series key, linear work, no join at all — a broadcast range join
would be quadratic per series and a SortMergeJoin on an inequality
is not expressible. This is the shape that survives 100 TB: the
window sorts within series partitions only, and partial state is two
columns regardless of tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: str | list[str] = "path",
    right_value: str = "value",
    out_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains
    ``out_col`` = the latest ``right.right_value`` with
    ``right.on <= left.on`` in the same ``by`` group (NULL when none
    exists or the match is older than ``tolerance`` units of ``on``).

    ``left`` keeps all its columns; ``right`` contributes only
    ``right_value``. When both sides carry a column named
    ``right_value`` (e.g. two point tables), the left one is
    preserved and the output column is named ``out_col``
    (default ``asof_<right_value>``).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    out_col = out_col or f"asof_{right_value}"

    keep = list(left.columns)
    l_tag = left.select(
        *keep,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
    )
    r_tag = right.select(
        *by_cols,
        F.col(on).alias(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in keep
            if c not in by_cols and c != on
        ],
        F.lit(0).alias("__is_left"),
        F.col(right_value).alias("__rv"),
    ).select(*keep, "__is_left", "__rv")

    # right rows sort BEFORE left rows at an equal timestamp, so the
    # backward match is inclusive (right.on == left.on matches).
    # Value and timestamp are carried as ONE struct so they always come
    # from the same right row — a NULL-valued right row still matches
    # (yielding NULL, pandas merge_asof semantics) and can never lend
    # its timestamp to an older value's tolerance check.
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("__is_left") == 0,
            F.struct(F.col(on).alias("__ts"), F.col("__rv").alias("__v")),
        ),
        ignorenulls=True,
    ).over(w)

    val: Column = carried["__v"]
    if tolerance is not None:
        val = F.when(F.col(on) - carried["__ts"] <= tolerance, carried["__v"])

    return (
        l_tag.unionByName(r_tag)
        .withColumn(out_col, val)
        .filter(F.col("__is_left") == 1)
        .drop("__is_left", "__rv")
    )
