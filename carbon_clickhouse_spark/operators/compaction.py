"""Background-merge emulation: periodic compaction jobs.

ClickHouse merges parts in the background, applying
ReplacingMergeTree dedup and GraphiteMergeTree rollup as it goes; the
reference's tables rely on that. Parquet has no background process, so
the engine offers the read-time views (``dedup.replacing_latest``,
``rollup.rollup``) plus these explicit compaction jobs — run them on a
schedule and the read views become no-ops over already-merged data.

At 100 TB: compact per month-partition (the write partitioning), so
each run touches one partition's files and rewrites them sorted by
``(path, time)`` — the same incremental unit ClickHouse merges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import replacing_latest
from .rollup import DEFAULT_RULES, rollup


def compact_replacing(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    months: list[str] | None = None,
    version_col: str = "version",
) -> None:
    """Rewrite an index/tagged table keeping only the max-version row
    per key (A3 applied physically)."""
    df = spark.read.parquet(table_path)
    if months and "month" in df.columns:
        df = df.filter(F.col("month").isin(months))
    merged = replacing_latest(df, keys, version_col)
    _atomic_overwrite(spark, merged, table_path)


def compact_rollup(
    spark: SparkSession,
    points_path: str,
    rules=DEFAULT_RULES,
    now: int | None = None,
    months: list[str] | None = None,
) -> None:
    """Downsample aged points per the rollup rules (A4 applied
    physically). Bucket value semantics follow the rules' functions;
    version collapses to the max in each bucket."""
    df = spark.read.parquet(points_path)
    if months and "month" in df.columns:
        df = df.filter(F.col("month").isin(months))
    rolled = rollup(df, rules, now=now)
    out = rolled.select(
        "path",
        "value",
        "time",
        F.to_date(F.timestamp_seconds("time")).alias("date"),
        F.lit(0).cast("long").alias("version"),
    )
    _atomic_overwrite(spark, out, points_path, month_partitioned=True)


def _atomic_overwrite(
    spark: SparkSession, df: DataFrame, path: str, month_partitioned: bool = False
) -> None:
    """Write-to-temp + swap (parquet has no transactional overwrite of
    a path being read; Delta would replace this with one MERGE)."""
    tmp = path.rstrip("/") + "._compacting"
    writer = df
    if month_partitioned:
        writer = df.withColumn("month", F.date_format("date", "yyyyMM"))
        writer.sortWithinPartitions("path", "time").write.mode("overwrite").partitionBy(
            "month"
        ).parquet(tmp)
    else:
        writer.sortWithinPartitions(*[c for c in ("path",) if c in df.columns]).write.mode(
            "overwrite"
        ).parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
