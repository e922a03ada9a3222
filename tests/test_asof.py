"""As-of join: semantics vs DuckDB's native ASOF JOIN oracle, plus
tolerance and multi-series behavior."""

import duckdb
from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.asof import asof_join

LEFT = [
    ("a", 10, 1.0), ("a", 20, 2.0), ("a", 30, 3.0),
    ("b", 15, 4.0), ("b", 25, 5.0),
]
RIGHT = [
    ("a", 5, 100.0), ("a", 20, 200.0), ("a", 29, 300.0),
    ("b", 16, 400.0),
]


def _spark_result(spark, tolerance=None):
    left = spark.createDataFrame(LEFT, ["path", "time", "value"])
    right = spark.createDataFrame(RIGHT, ["path", "time", "value"])
    out = asof_join(left, right, tolerance=tolerance)
    return {
        (r.path, r.time): (r.value, r.asof_value) for r in out.collect()
    }


def test_asof_matches_duckdb_oracle(spark):
    got = _spark_result(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE l(path VARCHAR, time BIGINT, value DOUBLE)")
    con.execute("CREATE TABLE r(path VARCHAR, time BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", LEFT)
    con.executemany("INSERT INTO r VALUES (?,?,?)", RIGHT)
    oracle = con.execute(
        "SELECT l.path, l.time, l.value, r.value FROM l "
        "ASOF LEFT JOIN r ON l.path = r.path AND l.time >= r.time"
    ).fetchall()
    want = {(p, t): (v, rv) for p, t, v, rv in oracle}
    assert got == want
    # spot semantics: inclusive match at equal ts, last-known carry
    assert got[("a", 20)][1] == 200.0
    assert got[("a", 30)][1] == 300.0
    assert got[("b", 15)][1] is None  # nothing at or before 15


def test_asof_tolerance(spark):
    got = _spark_result(spark, tolerance=5)
    assert got[("a", 10)][1] == 100.0   # gap 5 == tolerance: kept
    assert got[("a", 20)][1] == 200.0   # exact match
    assert got[("a", 30)][1] == 300.0   # gap 1
    assert got[("b", 25)][1] is None    # gap 25-16=9 exceeds tolerance 5
    assert _spark_result(spark, tolerance=9)[("b", 25)][1] == 400.0


def test_asof_null_right_value_matches_and_bounds_tolerance(spark):
    """A right row with a NULL value is still the latest match (pandas
    merge_asof semantics: the row matches, yielding NULL) — and its
    timestamp must never extend the tolerance window of an OLDER
    value (the pre-round-4 bug: value and timestamp came from
    different rows)."""
    left = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 30, 2.0)], ["path", "time", "value"]
    )
    right = spark.createDataFrame(
        [("a", 5, 100.0), ("a", 28, None)],
        "path STRING, time BIGINT, value DOUBLE",
    )
    # no tolerance: t=30's latest right row is (28, NULL) -> NULL
    got = {
        (r.path, r.time): r.asof_value
        for r in asof_join(left, right).collect()
    }
    assert got[("a", 10)] == 100.0
    assert got[("a", 30)] is None
    # tolerance 10: the NULL row at 28 must NOT lend its timestamp to
    # the stale value from t=5 (30-5 > 10) — still NULL, not 100.0
    got = {
        (r.path, r.time): r.asof_value
        for r in asof_join(left, right, tolerance=10).collect()
    }
    assert got[("a", 10)] == 100.0  # 10-5 <= 10: kept
    assert got[("a", 30)] is None
