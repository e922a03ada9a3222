"""Query-layer tests: glob find, tag find, series read."""

import datetime as dt

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.index import build_index
from carbon_clickhouse_spark.operators.tagged import build_tagged
from carbon_clickhouse_spark.query.finder import (
    find_metrics,
    find_tagged,
    glob_to_regex,
    read_series,
)

D = dt.date(2021, 7, 5)


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "path string, value double, time long, date date, version long"
    )


def test_glob_to_regex():
    assert glob_to_regex("a.*.c") == r"^a\.[^.]*\.c$"
    assert glob_to_regex("a.{b,c}.d") == r"^a\.(b|c)\.d$"
    assert glob_to_regex("host?") == "^host[^.]$"


def test_find_metrics(spark):
    pts = _points(
        spark,
        [
            ("srv.host1.cpu", 1.0, 100, D, 0),
            ("srv.host2.cpu", 1.0, 100, D, 0),
            ("srv.host2.mem", 1.0, 100, D, 0),
            ("other.host1.cpu", 1.0, 100, D, 0),
        ],
    )
    idx = build_index(pts)
    got = {r.path for r in find_metrics(idx, "srv.*.cpu").collect()}
    assert got == {"srv.host1.cpu", "srv.host2.cpu"}
    # directory find: trailing-dot rows
    got2 = {r.path for r in find_metrics(idx, "srv.*").collect()}
    assert got2 == {"srv.host1.", "srv.host2."}


def test_find_tagged(spark):
    pts = _points(
        spark,
        [
            ("cpu?env=prod&host=h1", 1.0, 100, D, 0),
            ("cpu?env=dev&host=h2", 1.0, 100, D, 0),
            ("mem?env=prod&host=h1", 1.0, 100, D, 0),
        ],
    )
    tg = build_tagged(pts)
    got = {r.path for r in find_tagged(tg, "env", "prod").collect()}
    assert got == {"cpu?env=prod&host=h1", "mem?env=prod&host=h1"}
    got2 = {
        r.path
        for r in find_tagged(tg, "env", "prod", extra=[("__name__", "cpu")]).collect()
    }
    assert got2 == {"cpu?env=prod&host=h1"}


def test_read_series(spark):
    pts = _points(
        spark,
        [
            ("a.cpu", 1.0, 100, D, 0),
            ("a.cpu", 3.0, 110, D, 0),
            ("a.cpu", 9.0, 500, D, 0),  # outside range
            ("b.cpu", 7.0, 100, D, 0),  # not requested
        ],
    )
    got = read_series(pts, ["a.cpu"], 0, 200, precision_s=60).collect()
    assert [(r.path, r.time, r.value) for r in got] == [("a.cpu", 60, 2.0)]
    paths_df = spark.createDataFrame([("a.cpu",)], ["path"])
    got2 = read_series(pts, paths_df, 0, 200).orderBy("time").collect()
    assert [(r.time, r.value) for r in got2] == [(100, 1.0), (110, 3.0)]


def test_find_metrics_reverse(spark):
    from carbon_clickhouse_spark.query.finder import find_metrics_reverse

    pts = _points(
        spark,
        [
            ("srv.host1.cpu.loadavg", 1.0, 100, D, 0),
            ("srv.host2.cpu.loadavg", 1.0, 100, D, 0),
            ("srv.host2.mem.used", 1.0, 100, D, 0),
        ],
    )
    idx = build_index(pts)
    got = {r.path for r in find_metrics_reverse(idx, "*.*.cpu.loadavg").collect()}
    assert got == {"srv.host1.cpu.loadavg", "srv.host2.cpu.loadavg"}


def test_new_series_only_hashed(spark):
    from carbon_clickhouse_spark.operators.dedup import new_series_only_hashed

    inc = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "path string, level int, v int"
    )
    ex = spark.createDataFrame([("a", 1)], "path string, level int")
    got = new_series_only_hashed(inc, ex, ["path", "level"]).collect()
    assert [(r.path, r.v) for r in got] == [("b", 20)]


def test_chunk_auto_interval():
    from carbon_clickhouse_spark.streaming.ingest import (
        effective_chunk_interval,
        parse_chunk_auto_interval,
    )

    auto = parse_chunk_auto_interval("5:10s,20:60s")
    assert auto == [(5, 10.0), (20, 60.0)]
    assert effective_chunk_interval(1.0, 0, auto) == 1.0
    assert effective_chunk_interval(1.0, 7, auto) == 10.0
    assert effective_chunk_interval(1.0, 25, auto) == 60.0


def test_read_series_month_partition_pruning(spark, tmp_path):
    """A stored month-partitioned root is pruned to the window's
    yyyyMM values (plus one slack month each side): the physical plan
    carries a month partition filter and results are unchanged."""
    from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables, write_tables
    from carbon_clickhouse_spark.query.finder import _months_between, read_series
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    # two points five months apart
    t_jan, t_jun = 1_704_100_000, 1_717_300_000  # 2024-01, 2024-06
    lines = [f"m.a 1 {t_jan}", f"m.a 2 {t_jun}"]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    root = str(tmp_path / "tables")
    write_tables(
        derive_tables(parse_plain_lines(df, now=t_jan), IngestConfig()), root
    )
    pts = spark.read.parquet(root + "/points")
    out = read_series(pts, ["m.a"], t_jan - 10, t_jan + 10)
    assert [r.value for r in out.collect()] == [1.0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "month" in plan  # partition filter reached the scan
    ms = _months_between(t_jan - 10, t_jan + 10)
    assert "202401" in ms and "202312" in ms and "202402" in ms
    assert "202406" not in ms
    # full window still sees both points
    both = read_series(pts, ["m.a"], t_jan - 10, t_jun + 10)
    assert sorted(r.value for r in both.collect()) == [1.0, 2.0]
