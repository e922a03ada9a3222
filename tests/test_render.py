"""Graphite render-function layer tests."""

from carbon_clickhouse_spark.query.render import (
    derivative,
    moving_average,
    non_negative_derivative,
    offset,
    per_second,
    scale,
    summarize,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "path string, time long, value double")


def test_derivatives(spark):
    s = _series(
        spark,
        [("m", 10, 100.0), ("m", 20, 103.0), ("m", 30, 101.0), ("m", 40, 111.0)],
    )
    d = {r.time: r.value for r in derivative(s).collect()}
    assert d == {10: None, 20: 3.0, 30: -2.0, 40: 10.0}
    nn = {r.time: r.value for r in non_negative_derivative(s).collect()}
    assert nn == {10: None, 20: 3.0, 30: None, 40: 10.0}
    ps = {r.time: r.value for r in per_second(s).collect()}
    assert ps == {10: None, 20: 0.3, 30: None, 40: 1.0}


def test_moving_average(spark):
    s = _series(spark, [("m", t, float(t)) for t in (1, 2, 3, 4)])
    ma = {r.time: r.value for r in moving_average(s, points=2).collect()}
    assert ma == {1: 1.0, 2: 1.5, 3: 2.5, 4: 3.5}


def test_summarize_scale_offset(spark):
    s = _series(spark, [("m", 10, 1.0), ("m", 70, 3.0), ("m", 80, 5.0)])
    sm = {r.time: r.value for r in summarize(s, 60, "sum").collect()}
    assert sm == {0: 1.0, 60: 8.0}
    sc = {r.time: r.value for r in scale(s, 2.0).collect()}
    assert sc == {10: 2.0, 70: 6.0, 80: 10.0}
    of = {r.time: r.value for r in offset(s, -1.0).collect()}
    assert of == {10: 0.0, 70: 2.0, 80: 4.0}


def test_integral_and_group_by_node(spark):
    from carbon_clickhouse_spark.query.render import group_by_node, integral

    s = _series(
        spark,
        [
            ("a.u1.x", 10, 1.0),
            ("a.u1.x", 20, 2.0),
            ("a.u1.y", 10, 5.0),
            ("a.u2.x", 10, 7.0),
        ],
    )
    it = {(r.path, r.time): r.value for r in integral(s).collect()}
    assert it[("a.u1.x", 20)] == 3.0
    gb = {(r.path, r.time): r.value for r in group_by_node(s, 1, "sum").collect()}
    assert gb == {("u1", 10): 6.0, ("u1", 20): 2.0, ("u2", 10): 7.0}
