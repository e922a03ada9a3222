"""Tag-index derivation (P12 + A1) — ``uploader/tagged.go:121-182``.

For each distinct tagged ``(date, path)``: parse the canonical path
back into unescaped ``k=v`` strings, prepend ``__name__=<name>``, and
emit one row per tag with the full tags array attached.

Scale notes: the whole derivation is JVM column expressions (the
unescape parse runs via ``try_url_decode``) over the *deduplicated*
``(date, path)`` set — series cardinality, not point volume.
``ignored_metrics`` (F7) keeps only the ``__name__`` row for listed
metric names (``uploader/tagged.go:145-165``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tags_jvm import parse_tags_col


def build_tagged(
    points: DataFrame,
    ignored_metrics: list[str] | None = None,
    path_col: str = "path",
    assume_tagged: bool = False,
    pre_deduped: bool = False,
) -> DataFrame:
    """points -> tagged rows ``(date, tag1, path, tags, version)``.

    ``assume_tagged`` skips the F8 routing filter; ``pre_deduped``
    skips the A1 series aggregate. Set both when feeding an already
    tagged-only, (path, date)-unique series set whose ``path`` is a
    derived expression — otherwise Catalyst pushes the routing
    predicate below the aggregate (and merges adjacent aggregates),
    re-evaluating the path derivation per POINT instead of per series.
    Persisted/stored inputs don't need either flag.
    """
    base = points if assume_tagged else points.filter(F.col(path_col).contains("?"))
    if not pre_deduped:
        base = (
            base.groupBy(F.col(path_col).alias("path"), F.col("date"))
            .agg(F.max("version").alias("version"))
        )
    else:
        base = base.select(F.col(path_col).alias("path"), "date", "version")

    parsed = base.withColumn("__parsed", parse_tags_col(F.col("path"))).select(
        "path",
        "date",
        "version",
        F.col("__parsed.name").alias("__name"),
        F.col("__parsed.tags").alias("tags"),
    )

    ignore_all = ignored_metrics is not None and "*" in ignored_metrics
    if ignored_metrics:
        only_name = F.lit(ignore_all) | F.col("__name").isin(
            [m for m in ignored_metrics if m != "*"]
        )
    else:
        only_name = F.lit(False)

    # tag1 candidates: the full tags array normally, just __name__ for
    # ignored metrics (the Tags payload always stays complete)
    tag1s = F.when(only_name, F.slice(F.col("tags"), 1, 1)).otherwise(
        F.col("tags")
    )

    # (date, path) is unique here (A1 dedup above, or the pre_deduped
    # caller contract), so exploding the DISTINCT tag1 candidates
    # already yields unique (date, tag1, path) rows — array_distinct
    # replaces what was a second full shuffle over the exploded
    # (x #tags) set guarding only the duplicate-tag-in-path edge
    return parsed.select(
        "date",
        F.explode(F.array_distinct(tag1s)).alias("tag1"),
        "path",
        "tags",
        "version",
    )
