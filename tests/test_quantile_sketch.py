"""Mergeable quantile sketch (operators/quantile_sketch.py): the
relative-error guarantee, bit-determinism under partitioning, exact
state mergeability across coarser groupings, and the stamp guard."""

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from carbon_clickhouse_spark.operators.quantile_sketch import (
    quantile_dd,
    quantile_merge,
    quantile_sketch,
)

QS = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]


def _mixed_rows():
    rng = random.Random(40423)
    rows = [("a", rng.lognormvariate(0.0, 2.0)) for _ in range(4000)]
    rows += [("a", -rng.lognormvariate(0.0, 1.0)) for _ in range(400)]
    rows += [("a", 0.0)] * 60
    rows += [("b", float(i)) for i in range(1, 801)]
    return rows


def test_relative_error_bound(spark):
    rows = _mixed_rows()
    df = spark.createDataFrame(rows, "g string, v double")
    scale, m = 1_000_000, 7
    est = {
        (r["g"], r["q"]): r["est"]
        for r in quantile_dd(df, ["g"], "v", QS, scale, m).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, xs in by_g.items():
        xs.sort()
        n = len(xs)
        for q in QS:
            exact = xs[max(1, math.ceil(q * n)) - 1]
            tol = abs(exact) * 2**-m + 1.0 / scale + 1e-12
            assert abs(est[(g, q)] - exact) <= tol, (g, q)


def test_state_deterministic_under_partitioning(spark):
    df = spark.createDataFrame(_mixed_rows(), "g string, v double")
    one = quantile_sketch(df.repartition(1), ["g"], "v")
    many = quantile_sketch(df.repartition(16), ["g"], "v")
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_merge_across_coarser_grouping_equals_direct(spark):
    # sketch per (g, shard), merge to g == sketch built directly on g
    rows = [
        (g, i % 4, v) for i, (g, v) in enumerate(_mixed_rows())
    ]
    df = spark.createDataFrame(rows, "g string, shard int, v double")
    fine = quantile_sketch(df, ["g", "shard"], "v")
    merged = quantile_merge(fine, ["g"], QS)
    direct = quantile_merge(quantile_sketch(df, ["g"], "v"), ["g"], QS)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_nulls_and_nans_skipped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 3.0)],
        "g string, v double",
    )
    out = quantile_dd(df, ["g"], "v", [0.5, 1.0])
    got = {r["q"]: r["est"] for r in out.collect()}
    assert got[0.5] == pytest.approx(1.0, rel=2**-7 + 1e-6)
    assert got[1.0] == pytest.approx(3.0, rel=2**-7 + 1e-6)


def test_all_zero_group(spark):
    df = spark.createDataFrame([("z", 0.0)] * 5, "g string, v double")
    out = quantile_dd(df, ["g"], "v", [0.5]).collect()
    assert out[0]["est"] == 0.0


def test_mixed_stamp_merge_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    st = quantile_sketch(df, ["g"], "v", scale=1000, m=5)
    with pytest.raises(Exception, match="stamp"):
        quantile_merge(st, ["g"], [0.5]).collect()  # default stamp


def test_overflow_cap_raises(spark):
    df = spark.createDataFrame([("a", 1e13)], "g string, v double")
    with pytest.raises(Exception, match="quantile_sketch"):
        quantile_sketch(df, ["g"], "v").collect()  # 1e19 > 2^55


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        quantile_sketch(df, ["g"], "v", m=0)
    with pytest.raises(ValueError):
        quantile_sketch(df, ["g"], "v", scale=0)
    with pytest.raises(ValueError):
        quantile_merge(quantile_sketch(df, ["g"], "v"), ["g"], [])
    with pytest.raises(ValueError):
        quantile_merge(quantile_sketch(df, ["g"], "v"), ["g"], [1.5])


def test_plan_shape_no_python(spark):
    """The sketch is pure JVM expressions: no Python/Arrow eval and a
    single Exchange for the state build."""
    df = spark.createDataFrame(_mixed_rows(), "g string, v double")
    plan = (
        quantile_sketch(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan
