"""Streaming moment statistics (streaming/moments.py): native
incremental aggregation over the exact decimal power sums must
reproduce the batch stat_moments / corr_matrix BIT-FOR-BIT on
replayed data."""

import json
import os
import random

from carbon_clickhouse_spark.operators.ch_aggregates import (
    corr_matrix,
    stat_moments,
)
from carbon_clickhouse_spark.streaming.moments import (
    streaming_corr_matrix,
    streaming_stat_moments,
)

SCHEMA = "g string, v double, y long"


def _write(landing, name, rows):
    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for g, v, y in rows:
            f.write(json.dumps({"g": g, "v": v, "y": y}) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def test_streaming_moments_bit_equal_to_batch(spark, tmp_path):
    landing = str(tmp_path / "mom")
    os.makedirs(landing)
    rng = random.Random(41)
    rows = [
        ("g%d" % (i % 3), rng.uniform(-20, 20), rng.randrange(100))
        for i in range(600)
    ]
    cut = len(rows) // 2

    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_stat_moments(stream, ["g"], "v", y_col="y")
    q = (
        out.writeStream.format("memory")
        .queryName("mom")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", rows[:cut])
        q.processAllAvailable()
        mid = {
            r["g"]: r
            for r in spark.sql(
                "SELECT * FROM mom"
            ).collect()
        }
        assert len(mid) == 3  # every group emitted a running value
        _write(landing, "b2.json", rows[cut:])
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()

    # latest emission per group: n_rows is the monotone version stamp
    final = {}
    for r in spark.sql("SELECT * FROM mom").collect():
        cur = final.get(r["g"])
        if cur is None or r["n_rows"] > cur["n_rows"]:
            final[r["g"]] = r
    bdf = spark.createDataFrame(rows, SCHEMA)
    want = {
        r["g"]: r
        for r in stat_moments(bdf, ["g"], "v", y_col="y").collect()
    }
    for g, w in want.items():
        got = final[g]
        # exact sums + shared expression tree => bitwise equality
        assert got["skew_pop"] == w["skew_pop"]
        assert got["kurt_pop"] == w["kurt_pop"]
        assert got["covar_pop"] == w["covar_pop"]
        assert got["corr_pop"] == w["corr_pop"]
        # and the mid-stream emission differed (it really runs)
        assert mid[g]["skew_pop"] != w["skew_pop"]


def test_streaming_corr_matrix_bit_equal_to_batch(spark, tmp_path):
    """The matrix aggregate is pure power sums — the streaming twin
    (native incremental agg + the shared corr_matrix_finals tree)
    must reproduce the batch corr_matrix bit-for-bit after replay,
    including a NaN row the shared filter drops on both sides."""
    landing = str(tmp_path / "cm")
    os.makedirs(landing)
    rng = random.Random(43)
    rows = [
        (
            "g%d" % (i % 3),
            rng.uniform(-5, 5),
            float(rng.randrange(50)),
            float(rng.randrange(7)),
        )
        for i in range(450)
    ]
    rows.append(("g0", float("nan"), 1.0, 2.0))  # dropped by both
    cut = len(rows) // 2
    schema = "g string, a double, b double, c double"

    def w(name, part):
        tmp = os.path.join(landing, f".{name}.tmp")
        with open(tmp, "w") as f:
            for g, a, b, c in part:
                f.write(json.dumps({"g": g, "a": a, "b": b, "c": c}) + "\n")
        os.rename(tmp, os.path.join(landing, name))

    stream = spark.readStream.schema(schema).json(landing)
    out = streaming_corr_matrix(stream, ["g"], ["a", "b", "c"])
    q = (
        out.writeStream.format("memory")
        .queryName("cmtx")
        .outputMode("update")
        .start()
    )
    try:
        w("b1.json", rows[:cut])
        q.processAllAvailable()
        w("b2.json", rows[cut:])
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()

    final = {}
    for r in spark.sql("SELECT * FROM cmtx").collect():
        k = (r["g"], r["x_name"], r["y_name"])
        cur = final.get(k)
        if cur is None or r["n_rows"] > cur["n_rows"]:
            final[k] = r
    bdf = spark.createDataFrame(rows, schema)
    want = {
        (r["g"], r["x_name"], r["y_name"]): r
        for r in corr_matrix(bdf, ["g"], ["a", "b", "c"]).collect()
    }
    assert set(final) == set(want)
    assert len(want) == 3 * 6  # 3 groups x n(n+1)/2 pairs
    for k, wrow in want.items():
        got = final[k]
        # exact sums + shared finishing tree => bitwise equality
        assert got["covar_pop"] == wrow["covar_pop"], k
        assert got["corr_pop"] == wrow["corr_pop"], k
