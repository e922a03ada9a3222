"""Streaming twins for the round-9 statistics
(streaming/statistics.py + finalize_theils_u): running cells +
shared finalization must reproduce the batch operators BIT-FOR-BIT
on replayed data; and the direct-call family (variance /
linear-regression / meanZ / corrMatrix) must run VERBATIM as
streaming aggregations with the same bit-parity — the batch function
IS the streaming operator there."""

import json
import os
import random

from carbon_clickhouse_spark.operators.ch_aggregates import (
    anova_f,
    corr_matrix,
    mean_z_test,
    rank_corr,
    simple_linear_regression,
    theils_u,
    variance_family,
)
from carbon_clickhouse_spark.streaming.contingency import (
    finalize_theils_u,
    streaming_contingency_cells,
)
from carbon_clickhouse_spark.streaming.statistics import (
    finalize_anova,
    finalize_rank_corr,
    streaming_anova_cells,
    streaming_rank_corr_cells,
)


def _write(landing, name, rows, cols):
    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(dict(zip(cols, r))) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def _latest(rows, key_cols, stamp_col):
    out = {}
    for r in rows:
        k = tuple(r[c] for c in key_cols)
        if k not in out or r[stamp_col] > out[k][stamp_col]:
            out[k] = r
    return list(out.values())


def test_streaming_rank_corr_and_theils_u(spark, tmp_path):
    rng = random.Random(61)
    rows = [
        ("g%d" % (i % 2), float(rng.randrange(25)), rng.randrange(6))
        for i in range(500)
    ]
    schema = "g string, v double, y int"
    df = spark.createDataFrame(rows, schema)

    landing = str(tmp_path / "rc")
    os.makedirs(landing)
    stream = spark.readStream.schema(schema).json(landing)
    q = (
        streaming_rank_corr_cells(stream, ["g"], "v", "y")
        .writeStream.format("memory")
        .queryName("rcc")
        .outputMode("update")
        .start()
    )
    q2 = (
        streaming_contingency_cells(
            stream.withColumn("xb", (stream["v"] % 5).cast("int")),
            ["g"],
            "xb",
            "y",
        )
        .writeStream.format("memory")
        .queryName("tuc")
        .outputMode("update")
        .start()
    )
    try:
        cut = len(rows) // 2
        _write(landing, "b1.json", rows[:cut], ("g", "v", "y"))
        q.processAllAvailable()
        q2.processAllAvailable()
        _write(landing, "b2.json", rows[cut:], ("g", "v", "y"))
        q.processAllAvailable()
        q2.processAllAvailable()
        assert q.exception() is None and q2.exception() is None
    finally:
        q.stop()
        q2.stop()

    snap = _latest(
        spark.sql("SELECT * FROM rcc").collect(), ["g", "__x", "__y"], "__c"
    )
    cells = spark.createDataFrame(
        [(r["g"], r["__x"], r["__y"], r["__c"]) for r in snap],
        "g string, __x double, __y int, __c long",
    )
    got = {
        r["g"]: r["rank_corr"]
        for r in finalize_rank_corr(cells, ["g"]).collect()
    }
    want = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(df, ["g"], "v", "y").collect()
    }
    assert got == want  # bitwise

    snap2 = _latest(
        spark.sql("SELECT * FROM tuc").collect(), ["g", "__x", "__y"], "__o"
    )
    cells2 = spark.createDataFrame(
        [(r["g"], r["__x"], r["__y"], r["__o"]) for r in snap2],
        "g string, __x int, __y int, __o long",
    )
    got2 = {
        (r["g"],): (r["n_rows"], r["theils_u"])
        for r in finalize_theils_u(cells2, ["g"]).collect()
    }
    bdf = df.withColumn("xb", (df["v"] % 5).cast("int"))
    want2 = {
        (r["g"],): (r["n_rows"], r["theils_u"])
        for r in theils_u(bdf, ["g"], "xb", "y").collect()
    }
    assert got2 == want2


def test_streaming_anova(spark, tmp_path):
    rng = random.Random(67)
    rows = [
        ("g%d" % (i % 2), round(rng.gauss(10 + (i % 4), 3), 3), i % 4)
        for i in range(600)
    ]
    schema = "g string, v double, l int"
    landing = str(tmp_path / "an")
    os.makedirs(landing)
    stream = spark.readStream.schema(schema).json(landing)
    q = (
        streaming_anova_cells(stream, ["g"], "v", "l")
        .writeStream.format("memory")
        .queryName("anc")
        .outputMode("update")
        .start()
    )
    try:
        cut = len(rows) // 2
        _write(landing, "b1.json", rows[:cut], ("g", "v", "l"))
        q.processAllAvailable()
        _write(landing, "b2.json", rows[cut:], ("g", "v", "l"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    snap = _latest(
        spark.sql("SELECT * FROM anc").collect(), ["g", "__l"], "__nl"
    )
    cells = spark.createDataFrame(
        [
            (r["g"], r["__l"], r["__nl"], r["__sl"], r["__ssl"])
            for r in snap
        ],
        "g string, __l int, __nl long, __sl decimal(38,0), "
        "__ssl decimal(38,0)",
    )
    got = {
        r["g"]: (r["f_stat"], r["df_between"], r["df_within"])
        for r in finalize_anova(cells, ["g"]).collect()
    }
    want = {
        r["g"]: (r["f_stat"], r["df_between"], r["df_within"])
        for r in anova_f(
            spark.createDataFrame(rows, schema), ["g"], "v", "l"
        ).collect()
    }
    assert got == want  # bitwise incl. the pinned fold


def test_direct_call_family_streams_verbatim(spark, tmp_path):
    """variance_family / simple_linear_regression / mean_z_test /
    corr_matrix accept a streaming frame AS-IS: native incremental
    aggregation over the same exact sums, update-mode emissions, and
    the final emission equals the batch result bitwise."""
    rng = random.Random(71)
    rows = [
        (
            "g%d" % (i % 2),
            round(rng.gauss(5, 3), 3),
            rng.randrange(2),
            rng.randrange(10),
        )
        for i in range(500)
    ]
    schema = "g string, v double, s int, y int"
    df = spark.createDataFrame(rows, schema)

    builders = {
        "vf": lambda st: variance_family(st, ["g"], "v", y_col="y"),
        "lr": lambda st: simple_linear_regression(st, ["g"], "y", "v"),
        "mz": lambda st: mean_z_test(st, ["g"], "v", "s", 9.0, 9.0),
        "cm": lambda st: corr_matrix(st, ["g"], ["v", "y"]),
    }
    batch = {
        "vf": variance_family(df, ["g"], "v", y_col="y"),
        "lr": simple_linear_regression(df, ["g"], "y", "v"),
        "mz": mean_z_test(df, ["g"], "v", "s", 9.0, 9.0),
        "cm": corr_matrix(df, ["g"], ["v", "y"]),
    }
    for name, build in builders.items():
        landing = str(tmp_path / name)
        os.makedirs(landing)
        stream = spark.readStream.schema(schema).json(landing)
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(f"dq_{name}")
            .outputMode("complete")
            .start()
        )
        try:
            cut = len(rows) // 2
            _write(landing, "b1.json", rows[:cut], ("g", "v", "s", "y"))
            q.processAllAvailable()
            _write(landing, "b2.json", rows[cut:], ("g", "v", "s", "y"))
            q.processAllAvailable()
            assert q.exception() is None, name
        finally:
            q.stop()
        got = sorted(
            tuple(r) for r in spark.sql(f"SELECT * FROM dq_{name}").collect()
        )
        want = sorted(tuple(r) for r in batch[name].collect())
        assert got == want, name  # bitwise
