"""Path-index derivation (P9/P11 + A1) — ``uploader/index.go:34-104``.

For each distinct untagged ``(date, path)`` the reference emits:

- tree rows (fixed date 1970-02-12): full path at ``level+20000``,
  every ancestor prefix ``a.`` .. ``a.b.c.`` at ``l+20000``, and the
  reversed path at ``level+30000``
- daily rows (point date): path at ``level``, reversed at
  ``level+10000`` (omitted with ``disable-daily-index``)

Implementation notes (scale): one scan builds an array of
``(date, level, path)`` structs per input row and explodes it — no
unions, a single shuffle for the final per-key dedup. The per-batch
``newUniq`` map of the reference is the same dedup expressed
declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import TREE_DATE
from ..functions.paths import ancestor_prefixes, path_level, path_reverse
from ..schemas import (
    REVERSE_LEVEL_OFFSET,
    REVERSE_TREE_LEVEL_OFFSET,
    TREE_LEVEL_OFFSET,
)


def build_index(
    points: DataFrame,
    disable_daily: bool = False,
    path_col: str = "path",
) -> DataFrame:
    """points -> index rows ``(date, level, path, version)``.

    Input needs columns ``path, date, version``; tagged paths are
    excluded (``uploader/index.go:172-175``).
    """
    base = (
        points.filter(~F.col(path_col).contains("?"))
        .groupBy(F.col(path_col).alias("path"), F.col("date"))
        .agg(F.max("version").alias("version"))
    )

    level = path_level("path")
    rev = path_reverse("path")
    tree_date = F.lit(TREE_DATE)

    row = lambda d, lvl, p: F.struct(  # noqa: E731
        d.alias("date"), lvl.cast("int").alias("level"), p.alias("path")
    )

    rows = F.concat(
        F.array(
            row(tree_date, level + TREE_LEVEL_OFFSET, F.col("path")),
            row(tree_date, level + REVERSE_TREE_LEVEL_OFFSET, rev),
        ),
        F.transform(
            ancestor_prefixes("path"),
            lambda p, i: row(tree_date, i + 1 + TREE_LEVEL_OFFSET, p),
        ),
        F.when(F.lit(disable_daily), F.array().cast(
            "array<struct<date:date,level:int,path:string>>"
        )).otherwise(
            F.array(
                row(F.col("date"), level, F.col("path")),
                row(F.col("date"), level + REVERSE_LEVEL_OFFSET, rev),
            )
        ),
    )

    exploded = base.select(
        F.explode(rows).alias("r"), F.col("version")
    ).select("r.date", "r.level", "r.path", "version")

    # A1: one row per (date, level, path) per batch, max version wins
    return exploded.groupBy("date", "level", "path").agg(
        F.max("version").alias("version")
    )


def build_tree(
    points: DataFrame,
    tree_date=None,
    path_col: str = "path",
) -> DataFrame:
    """Legacy ``graphite_tree`` table (``uploader/tree.go:30-115``):
    untagged full paths + trailing-dot ancestors at their levels, NO
    reverse and NO daily rows. ``tree_date`` None omits the Date
    column (the reference's dateless variant)."""
    base = (
        points.filter(~F.col(path_col).contains("?"))
        .groupBy(F.col(path_col).alias("path"))
        .agg(F.max("version").alias("version"))
    )
    level = path_level("path")
    row = lambda lvl, p: F.struct(  # noqa: E731
        lvl.cast("int").alias("level"), p.alias("path")
    )
    rows = F.concat(
        F.array(row(level, F.col("path"))),
        F.transform(ancestor_prefixes("path"), lambda p, i: row(i + 1, p)),
    )
    out = (
        base.select(F.explode(rows).alias("r"), "version")
        .select("r.level", "r.path", "version")
        .groupBy("level", "path")
        .agg(F.max("version").alias("version"))
    )
    if tree_date is not None:
        out = out.select(
            F.lit(tree_date).cast("date").alias("date"), "level", "path", "version"
        )
    return out


def build_series(
    points: DataFrame, reverse: bool = False, path_col: str = "path"
) -> DataFrame:
    """Legacy ``graphite_series`` table (``uploader/series.go:30-80``):
    one row per (date, name) for untagged names — no ancestors;
    ``reverse=True`` is the series-reverse uploader."""
    path = F.col(path_col)
    if reverse:
        path = path_reverse(path_col)
    return (
        points.filter(~F.col(path_col).contains("?"))
        .select(path.alias("path"), "date", "version")
        .groupBy("date", "path")
        .agg(F.max("version").alias("version"))
        .select(
            "date",
            path_level("path").cast("int").alias("level"),
            "path",
            "version",
        )
    )
