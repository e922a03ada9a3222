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


def _py_bucket(value: float, scale: int, m: int) -> int | None:
    """Independent pure-Python reference of the bucket rule (half-up
    round, exact integer shifts)."""
    import math

    if value is None or math.isnan(value):
        return None
    # Spark/DuckDB round() on doubles: half away from zero
    x = value * scale
    q = int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5)
    )
    if q == 0:
        return 0
    a = abs(q)
    k = a.bit_length() - 1  # exact floor(log2)
    sb = ((a - (1 << k)) << m) // (1 << k)
    o = k * (1 << m) + sb + 1
    return o if q > 0 else -o


def test_bucket_boundary_parity_three_engines(spark):
    """Spark, DuckDB, and an independent Python fold agree on the
    bucket of every crafted boundary value: exact powers of two (the
    values where an uncorrected float log2 flips), one ULP either
    side, half-up rounding edges, negatives, and tiny magnitudes."""
    import math

    import duckdb

    scale, m = 1_000_000, 7
    vals = [0.0, 1e-6, -1e-6, 0.5e-6, 1.5e-6]
    for k in range(0, 40, 3):
        p = (1 << k) / scale
        for v in (p, math.nextafter(p, 0), math.nextafter(p, math.inf)):
            vals += [v, -v]
    # half-up edges: q = x.5 exactly representable
    vals += [2.5e-6, -2.5e-6, 3.5e-6, 1000000.5 / scale]
    df = spark.createDataFrame(
        [(f"v{i}", v) for i, v in enumerate(vals)], "g string, v double"
    )
    from carbon_clickhouse_spark.operators.quantile_sketch import (
        bucketize,
    )

    got = {
        r["g"]: r["bucket"]
        for r in bucketize(df, "v", scale, m).collect()
    }
    want = {
        f"v{i}": _py_bucket(v, scale, m) for i, v in enumerate(vals)
    }
    assert got == want
    # DuckDB replays the oracle arithmetic on the same values
    rows = [(f"v{i}", v) for i, v in enumerate(vals)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = dict(
        con.execute(
            """
            WITH src AS (
              SELECT g, CAST(round(v * 1000000) AS BIGINT) AS qv FROM t
            ), kx AS (
              SELECT g, qv, CASE WHEN qv = 0 THEN 0 ELSE
                CAST(floor(log2(CAST(abs(qv) AS DOUBLE))) AS INT) END AS k0
              FROM src
            ), kc AS (
              SELECT g, qv, CASE WHEN qv = 0 THEN 0
                WHEN (1::BIGINT << (k0+1)) <= abs(qv) THEN k0+1
                WHEN (1::BIGINT << k0) > abs(qv) THEN k0-1
                ELSE k0 END AS k
              FROM kx
            )
            SELECT g, CASE WHEN qv = 0 THEN 0
              ELSE CAST(sign(qv) AS BIGINT) * (CAST(k AS BIGINT)*128
                   + ((abs(qv) - (1::BIGINT << k)) << 7)
                     // (1::BIGINT << k) + 1) END
            FROM kc
            """
        ).fetchall()
    )
    assert duck == want
