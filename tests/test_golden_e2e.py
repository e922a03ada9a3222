"""End-to-end golden test — the reference's tests/plain scenario.

Ingests the exact input lines of ``tests/plain/test.toml:3-94`` through
the full pipeline and asserts the golden verify outputs
(``test.toml:109-189``) — the same line-by-line diff the reference's
e2e harness performs against a live ClickHouse, run here as Spark SQL
over the derived tables.
"""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables
from carbon_clickhouse_spark.sources.plain import parse_plain_lines

INPUT_LINES = [
    "test.host1.cpu.loadavg 10.2 1625478240",
    "cpu.loadavg;env=test2;host=host1;env=test 21.4 1625478300",
    "cpu.loadavg;env=test;host=host1 2.1 1625478240",
    "test.host1.cpu.loadavg 9.4 1625478300",
    "cpu.loadavg;host=host1;env=test 1.3 1625478360",
    "spec_symbols;minus=-;plus=+;percent=%;underscore=_;colon=:;hash=#;forward/0=/0 5.1 1625478360",
    "non-ascii.иван;tagged=true 1.2 1625478240",
] + [
    f"test2.host{h}.cpu{c}.{m} 10.2 1625478240"
    for h in (1, 2, 31, 32)
    for c in ("0", "1", "2", "3", "-total")
    for m in ("user", "idle", "system", "iowait")
] + [
    "test2.host2.cpu.loadavg 9.4 1625478300",
    "test2.host31.cpu.loadavg 9.4 1625478300",
    "test2.host32.cpu.loadavg 9.4 1625478300",
]


@pytest.fixture(scope="module")
def tables(spark):
    lines = spark.createDataFrame([(l,) for l in INPUT_LINES], ["line"])
    points = parse_plain_lines(lines, now=1625478400)
    t = derive_tables(points, IngestConfig(now=1625478400))
    return {k: v.cache() for k, v in t.items()}


def test_index_golden(tables):
    # test.toml:109-120
    got = (
        tables["index"]
        .filter(F.col("path").like("test.%") | F.col("path").like("%.test"))
        .orderBy("date", "level", "path")
        .collect()
    )
    assert [(str(r.date), r.level, r.path) for r in got] == [
        ("1970-02-12", 20001, "test."),
        ("1970-02-12", 20002, "test.host1."),
        ("1970-02-12", 20003, "test.host1.cpu."),
        ("1970-02-12", 20004, "test.host1.cpu.loadavg"),
        ("1970-02-12", 30004, "loadavg.cpu.host1.test"),
        ("2021-07-05", 4, "test.host1.cpu.loadavg"),
        ("2021-07-05", 10004, "loadavg.cpu.host1.test"),
    ]


def test_points_golden(tables):
    # test.toml:122-126
    got = (
        tables["points"]
        .filter(F.col("path").like("test.%"))
        .orderBy("time", "path")
        .collect()
    )
    assert [
        (r.path, r.value, r.time, str(r.date), r.version) for r in got
    ] == [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, "2021-07-05", 0),
        ("test.host1.cpu.loadavg", 9.4, 1625478300, "2021-07-05", 0),
    ]


def test_points_reverse_golden(tables):
    # test.toml:128-132
    got = (
        tables["points_reverse"]
        .filter(F.col("path").like("%.test"))
        .orderBy("time", "path")
        .collect()
    )
    assert [(r.path, r.value, r.time) for r in got] == [
        ("loadavg.cpu.host1.test", 10.2, 1625478240),
        ("loadavg.cpu.host1.test", 9.4, 1625478300),
    ]


def test_tagged_golden(tables):
    # test.toml:136-141
    got = (
        tables["tagged"]
        .filter(F.col("path").like("cpu.loadavg%"))
        .orderBy("date", "tag1", "path")
        .collect()
    )
    expected_tags = ["__name__=cpu.loadavg", "env=test", "host=host1"]
    assert [(str(r.date), r.tag1, r.path) for r in got] == [
        ("2021-07-05", "__name__=cpu.loadavg", "cpu.loadavg?env=test&host=host1"),
        ("2021-07-05", "env=test", "cpu.loadavg?env=test&host=host1"),
        ("2021-07-05", "host=host1", "cpu.loadavg?env=test&host=host1"),
    ]
    assert all(sorted(r.tags) == expected_tags for r in got)


def test_tagged_points_golden(tables):
    # test.toml:143-155 — both points tables keep tagged paths verbatim
    for tbl in ("points", "points_reverse"):
        got = (
            tables[tbl]
            .filter(F.col("path").like("cpu.loadavg?%"))
            .orderBy("time", "path")
            .collect()
        )
        assert [(r.path, r.value, r.time) for r in got] == [
            ("cpu.loadavg?env=test&host=host1", 2.1, 1625478240),
            ("cpu.loadavg?env=test&host=host1", 21.4, 1625478300),
            ("cpu.loadavg?env=test&host=host1", 1.3, 1625478360),
        ]


def test_spec_symbols_golden(tables):
    # test.toml:159-183
    path = (
        "spec_symbols?colon=%3A&forward%2F0=%2F0&hash=%23&minus=-"
        "&percent=%25&plus=%2B&underscore=_"
    )
    got = (
        tables["tagged"]
        .filter(F.col("path").like("spec_symbols?%"))
        .orderBy("tag1")
        .collect()
    )
    assert [r.tag1 for r in got] == [
        "__name__=spec_symbols",
        "colon=:",
        "forward/0=/0",
        "hash=#",
        "minus=-",
        "percent=%",
        "plus=+",
        "underscore=_",
    ]
    assert all(r.path == path for r in got)
    assert all(
        sorted(r.tags)
        == [
            "__name__=spec_symbols",
            "colon=:",
            "forward/0=/0",
            "hash=#",
            "minus=-",
            "percent=%",
            "plus=+",
            "underscore=_",
        ]
        for r in got
    )
    pts = tables["points"].filter(F.col("path").like("spec_symbols?%")).collect()
    assert [(r.path, r.value, r.time) for r in pts] == [(path, 5.1, 1625478360)]


def test_non_ascii_golden(tables):
    # test.toml:186-197
    path = "non-ascii.%D0%B8%D0%B2%D0%B0%D0%BD?tagged=true"
    got = (
        tables["tagged"]
        .filter(F.col("path").like("non-ascii.%?%"))
        .orderBy("tag1")
        .collect()
    )
    assert [(r.tag1, r.path) for r in got] == [
        ("__name__=non-ascii.иван", path),
        ("tagged=true", path),
    ]
    assert all(
        sorted(r.tags) == ["__name__=non-ascii.иван", "tagged=true"] for r in got
    )
    pts = tables["points"].filter(F.col("path").like("non-ascii.%?%")).collect()
    assert [(r.path, r.value, r.time) for r in pts] == [(path, 1.2, 1625478240)]


def test_idempotent_reingest(tables, spark):
    """SURVEY §7.3: ingesting the same lines twice must leave index and
    tagged query results unchanged after ReplacingMergeTree dedup."""
    from carbon_clickhouse_spark.operators.dedup import replacing_latest

    idx = tables["index"]
    doubled = replacing_latest(
        idx.union(idx), ["date", "level", "path"]
    )
    assert doubled.count() == idx.count()


def test_nodaily_index_golden(spark):
    """tests/plain-nodaily scenario: disable-daily-index drops the
    per-date rows, keeps tree rows (carbon-clickhouse.conf.tpl:15)."""
    from carbon_clickhouse_spark.operators.index import build_index
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    lines = spark.createDataFrame([(l,) for l in INPUT_LINES], ["line"])
    points = parse_plain_lines(lines, now=1625478400)
    idx = build_index(points, disable_daily=True)
    got = (
        idx.filter(
            F.col("path").like("test.%") | F.col("path").like("%.test")
        )
        .orderBy("date", "level", "path")
        .collect()
    )
    assert [(str(r.date), r.level, r.path) for r in got] == [
        ("1970-02-12", 20001, "test."),
        ("1970-02-12", 20002, "test.host1."),
        ("1970-02-12", 20003, "test.host1.cpu."),
        ("1970-02-12", 20004, "test.host1.cpu.loadavg"),
        ("1970-02-12", 30004, "loadavg.cpu.host1.test"),
    ]


def test_legacy_tree_series_tables(spark, tmp_path):
    """A config naming the legacy uploader types (tree / series /
    series-reverse, uploader/uploader.go:48-60) gets those tables
    derived and written alongside the modern four."""
    from carbon_clickhouse_spark.config import load_config
    from carbon_clickhouse_spark.pipeline import derive_tables, write_tables
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    cfg = load_config(
        """
[upload.graphite_tree]
type = "tree"
table = "graphite_tree"
date = "2021-07-05"

[upload.graphite_series]
type = "series"
table = "graphite_series"

[upload.graphite_series_reverse]
type = "series-reverse"
table = "graphite_series_reverse"
"""
    )
    ic = cfg.ingest("tcp", now=1625478400)
    assert set(ic.legacy_tables) == {"tree", "series", "series-reverse"}
    assert ic.tree_date == "2021-07-05"

    lines = spark.createDataFrame(
        [("a.b.c 1 1625400000",), ("a.b.d 2 1625400060",)], "line string"
    )
    tables = derive_tables(parse_plain_lines(lines), ic)
    assert {"tree", "series", "series_reverse"} <= set(tables)
    root = str(tmp_path / "t")
    write_tables(tables, root)

    tree = {
        (r.level, r.path)
        for r in spark.read.parquet(f"{root}/tree").collect()
    }
    # full paths + trailing-dot ancestors, no reverse, no daily rows
    assert tree == {
        (3, "a.b.c"), (3, "a.b.d"), (1, "a."), (2, "a.b."),
    }
    series = {
        r.path for r in spark.read.parquet(f"{root}/series").collect()
    }
    assert series == {"a.b.c", "a.b.d"}  # no ancestors
    rev = {
        r.path
        for r in spark.read.parquet(f"{root}/series_reverse").collect()
    }
    assert rev == {"c.b.a", "d.b.a"}


def test_clickhouse_views_run_reference_sql(spark, tmp_path, tables):
    """register_clickhouse_views: the reference's own e2e verify SQL
    (tests/plain/test.toml) runs in spark.sql nearly verbatim over the
    stored root (arraySort -> array_sort is the only edit)."""
    from carbon_clickhouse_spark.pipeline import (
        register_clickhouse_views,
        write_tables,
    )

    root = str(tmp_path / "chv")
    write_tables(tables, root)
    views = register_clickhouse_views(spark, root)
    assert {"graphite", "graphite_reverse", "graphite_index",
            "graphite_tagged"} <= set(views)

    # test.toml:109-120
    idx = spark.sql(
        "SELECT Date, Level, Path FROM graphite_index "
        "WHERE Path LIKE 'test.%' OR Path LIKE '%.test' "
        "GROUP BY Date, Level, Path, Version ORDER BY Date, Level, Path"
    ).collect()
    assert [(str(r.Date), r.Level, r.Path) for r in idx] == [
        ("1970-02-12", 20001, "test."),
        ("1970-02-12", 20002, "test.host1."),
        ("1970-02-12", 20003, "test.host1.cpu."),
        ("1970-02-12", 20004, "test.host1.cpu.loadavg"),
        ("1970-02-12", 30004, "loadavg.cpu.host1.test"),
        ("2021-07-05", 4, "test.host1.cpu.loadavg"),
        ("2021-07-05", 10004, "loadavg.cpu.host1.test"),
    ]
    # test.toml:122-126 (zero_version=True in this fixture -> Timestamp 0)
    pts = spark.sql(
        "SELECT Path, Value, Time, Date, Timestamp FROM graphite "
        "WHERE Path LIKE 'test.%' ORDER BY Time, Path"
    ).collect()
    assert [(r.Path, r.Value, r.Time, str(r.Date), r.Timestamp) for r in pts] == [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, "2021-07-05", 0),
        ("test.host1.cpu.loadavg", 9.4, 1625478300, "2021-07-05", 0),
    ]
    # test.toml:136-141 (arraySort -> array_sort)
    tags = spark.sql(
        "SELECT Date, Tag1, Path, array_sort(Tags) as Tags "
        "FROM graphite_tagged WHERE Path LIKE 'cpu.loadavg%' "
        "ORDER BY Date, Tag1, Path"
    ).collect()
    assert [(str(r.Date), r.Tag1, r.Path, list(r.Tags)) for r in tags] == [
        ("2021-07-05", "__name__=cpu.loadavg", "cpu.loadavg?env=test&host=host1",
         ["__name__=cpu.loadavg", "env=test", "host=host1"]),
        ("2021-07-05", "env=test", "cpu.loadavg?env=test&host=host1",
         ["__name__=cpu.loadavg", "env=test", "host=host1"]),
        ("2021-07-05", "host=host1", "cpu.loadavg?env=test&host=host1",
         ["__name__=cpu.loadavg", "env=test", "host=host1"]),
    ]
