"""Compaction jobs: physical ReplacingMergeTree / rollup application."""

import datetime as dt

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.compaction import (
    compact_replacing,
    compact_rollup,
)
from carbon_clickhouse_spark.operators.rollup import Retention, RollupRule

D = dt.date(2021, 7, 5)


def test_compact_replacing(spark, tmp_path):
    path = str(tmp_path / "index")
    df = spark.createDataFrame(
        [
            (D, 4, "a.b", 1),
            (D, 4, "a.b", 9),  # newer version wins
            (D, 4, "c.d", 3),
        ],
        "date date, level int, path string, version long",
    )
    df.write.parquet(path)
    compact_replacing(spark, path, ["date", "level", "path"])
    got = {(r.path, r.version) for r in spark.read.parquet(path).collect()}
    assert got == {("a.b", 9), ("c.d", 3)}


def test_compact_rollup(spark, tmp_path):
    path = str(tmp_path / "points")
    df = spark.createDataFrame(
        [
            ("m.avg", 1.0, 1000, D, 5),
            ("m.avg", 3.0, 1010, D, 6),
            ("m.sum", 2.0, 1000, D, 5),
            ("m.sum", 4.0, 1010, D, 5),
        ],
        "path string, value double, time long, date date, version long",
    )
    df.withColumn("month", F.date_format("date", "yyyyMM")).write.partitionBy(
        "month"
    ).parquet(path)
    rules = (
        RollupRule(r"\.sum$", "sum", (Retention(0, 60),)),
        RollupRule("", "avg", (Retention(0, 60),)),
    )
    compact_rollup(spark, path, rules, now=10000)
    got = {
        (r.path, r.time): r.value for r in spark.read.parquet(path).collect()
    }
    assert got == {("m.avg", 960): 2.0, ("m.sum", 960): 6.0}


def test_ingest_and_store_bulk(spark, tmp_path):
    from carbon_clickhouse_spark.pipeline import IngestConfig, ingest_and_store
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    lines = spark.createDataFrame(
        [
            ("a.b.c 1.5 1625478240",),
            ("x;env=p 2.5 1625478300",),
        ],
        ["line"],
    )
    points = parse_plain_lines(lines, now=1625478400)
    root = str(tmp_path / "t")
    ingest_and_store(points, root, IngestConfig(now=1625478400))
    pts = spark.read.parquet(f"{root}/points")
    assert pts.count() == 2
    rev = {r.path for r in spark.read.parquet(f"{root}/points_reverse").collect()}
    assert rev == {"c.b.a", "x?env=p"}
    idx = spark.read.parquet(f"{root}/index")
    # 'a.b.c' appears as the tree row (20003) and the daily row (3);
    # the reversed form 'c.b.a' carries the +10000/+30000 levels
    assert idx.filter(idx.path == "a.b.c").count() == 2
    assert idx.filter(idx.path == "c.b.a").count() == 2
    tg = spark.read.parquet(f"{root}/tagged")
    assert {r.tag1 for r in tg.collect()} == {"__name__=x", "env=p"}
