"""Spark-side parser parity — vectors from receiver/plain_test.go:154-205."""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.sources.plain import parse_plain_lines

NOW = 1700000000

# (line, expected_name, value, ts) — name None => dropped
VECTORS = [
    ("42", None, None, None),
    ("", None, None, None),
    ("\n", None, None, None),
    ("metric..name 42 \n", None, None, None),
    ("metric..name 42", None, None, None),
    ("metric.name 42 a1422642189\n", None, None, None),
    ("metric.name 42a 1422642189\n", None, None, None),
    ("metric.name NaN 1422642189\n", None, None, None),
    ("metric.name 42 NaN\n", None, None, None),
    ("metric.name -42.76 1422642189\n", "metric.name", -42.76, 1422642189),
    ("metric.name 42.15 1422642189\n", "metric.name", 42.15, 1422642189),
    ("metric..name 42.15 1422642189\n", "metric.name", 42.15, 1422642189),
    ("metric...name 42.15 1422642189\n", "metric.name", 42.15, 1422642189),
    ("metric.name 42.15 1422642189\r\n", "metric.name", 42.15, 1422642189),
    (
        "metric.name;tag=value;k=v 42.15 1422642189\r\n",
        "metric.name?k=v&tag=value",
        42.15,
        1422642189,
    ),
    ("metric..name 42.15 -1\n", "metric.name", 42.15, NOW),
    (
        "cpu.loadavg;env=test2;host=host1;env=test 21.4 1422642189\n",
        "cpu.loadavg?env=test&host=host1",
        21.4,
        1422642189,
    ),
]


def test_plain_parse_vectors(spark):
    df = spark.createDataFrame([(v[0],) for v in VECTORS], ["line"])
    out = parse_plain_lines(df, now=NOW).collect()
    expected = [(v[1], v[2], v[3]) for v in VECTORS if v[1] is not None]
    got = [(r.path, r.value, r.time) for r in out]
    assert sorted(got) == sorted(expected)


def test_parse_dates_and_version(spark):
    df = spark.createDataFrame([("a.b 1.5 1625478240\n",)], ["line"])
    row = parse_plain_lines(df, now=NOW).collect()[0]
    assert str(row.date) == "2021-07-05"
    assert row.version == 0
    row = parse_plain_lines(df, now=NOW, zero_version=False).collect()[0]
    assert row.version == NOW
