"""Streaming two-sample + contingency twins (streaming/twosample.py,
streaming/contingency.py): native incremental aggregation over the
batch operators' mergeable summaries must reproduce the batch
statistics BIT-FOR-BIT on replayed data — exact sums are order- and
batching-independent, and the final expression trees are literally
shared code objects."""

import json
import os
import random

from carbon_clickhouse_spark.operators.ch_aggregates import (
    contingency_stats,
    two_sample_tests,
)
from carbon_clickhouse_spark.streaming.contingency import (
    finalize_contingency,
    streaming_contingency_cells,
)
from carbon_clickhouse_spark.streaming.twosample import (
    finalize_two_sample_ranks,
    streaming_two_sample_cells,
    streaming_two_sample_t,
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


def test_streaming_two_sample_bit_equal_to_batch(spark, tmp_path):
    """Both twins at once: the t stream's final emission and the
    rank-table snapshot's finalization equal the batch operator
    bitwise; the mid-stream t emission differs (it really runs)."""
    landing = str(tmp_path / "ts")
    os.makedirs(landing)
    rng = random.Random(43)
    rows = [
        (
            "g%d" % (i % 3),
            round(rng.uniform(-30, 30), 3),
            rng.randrange(2),
        )
        for i in range(600)
    ]
    cut = len(rows) // 2
    schema = "g string, v double, s int"

    stream = spark.readStream.schema(schema).json(landing)
    tq = (
        streaming_two_sample_t(stream, ["g"], "v", "s")
        .writeStream.format("memory")
        .queryName("tst")
        .outputMode("update")
        .start()
    )
    cq = (
        streaming_two_sample_cells(stream, ["g"], "v", "s")
        .writeStream.format("memory")
        .queryName("tsc")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", rows[:cut], ("g", "v", "s"))
        tq.processAllAvailable()
        cq.processAllAvailable()
        mid = {r["g"]: r for r in spark.sql("SELECT * FROM tst").collect()}
        assert len(mid) == 3
        _write(landing, "b2.json", rows[cut:], ("g", "v", "s"))
        tq.processAllAvailable()
        cq.processAllAvailable()
        assert tq.exception() is None and cq.exception() is None
    finally:
        tq.stop()
        cq.stop()

    want = {
        r["g"]: r
        for r in two_sample_tests(
            spark.createDataFrame(rows, schema), ["g"], "v", "s"
        ).collect()
    }

    # t family: latest emission per group (n_rows is the stamp)
    tfinal = {
        r[0]: r
        for r in _latest(
            spark.sql("SELECT * FROM tst").collect(), ["g"], "n_rows"
        )
    }
    for g, w in want.items():
        got = tfinal[g]
        assert got["t_student"] == w["t_student"]
        assert got["t_welch"] == w["t_welch"]
        assert got["dof_welch"] == w["dof_welch"]
        assert mid[g]["t_student"] != w["t_student"]

    # rank family: latest cell snapshot (__c is the stamp), then the
    # shared finalization — bitwise equal U / z / KS
    snap_rows = _latest(
        spark.sql("SELECT * FROM tsc").collect(), ["g", "__q"], "__c"
    )
    snap = spark.createDataFrame(
        [(r["g"], r["__q"], r["__c"], r["__c0"]) for r in snap_rows],
        "g string, __q long, __c long, __c0 long",
    )
    got_rank = {
        r["g"]: r
        for r in finalize_two_sample_ranks(snap, ["g"]).collect()
    }
    for g, w in want.items():
        assert got_rank[g]["u_stat"] == w["u_stat"]
        assert got_rank[g]["z_u"] == w["z_u"]
        assert got_rank[g]["ks_d"] == w["ks_d"]


def test_streaming_contingency_bit_equal_to_batch(spark, tmp_path):
    landing = str(tmp_path / "ct")
    os.makedirs(landing)
    rng = random.Random(47)
    rows = [
        ("g%d" % (i % 2), rng.randrange(9), rng.randrange(5))
        for i in range(700)
    ]
    cut = len(rows) // 2
    schema = "g string, x int, y int"

    stream = spark.readStream.schema(schema).json(landing)
    q = (
        streaming_contingency_cells(stream, ["g"], "x", "y")
        .writeStream.format("memory")
        .queryName("ctc")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", rows[:cut], ("g", "x", "y"))
        q.processAllAvailable()
        n_mid = spark.sql("SELECT count(*) AS c FROM ctc").collect()[0]["c"]
        assert n_mid > 0
        _write(landing, "b2.json", rows[cut:], ("g", "x", "y"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    snap_rows = _latest(
        spark.sql("SELECT * FROM ctc").collect(), ["g", "__x", "__y"], "__o"
    )
    snap = spark.createDataFrame(
        [(r["g"], r["__x"], r["__y"], r["__o"]) for r in snap_rows],
        "g string, __x int, __y int, __o long",
    )
    got = {r["g"]: r for r in finalize_contingency(snap, ["g"]).collect()}
    want = {
        r["g"]: r
        for r in contingency_stats(
            spark.createDataFrame(rows, schema), ["g"], "x", "y"
        ).collect()
    }
    for g, w in want.items():
        assert got[g]["chi_sq"] == w["chi_sq"]  # pinned fold, bitwise
        assert got[g]["cramers_v"] == w["cramers_v"]
        assert got[g]["cramers_v_bc"] == w["cramers_v_bc"]
        assert got[g]["contingency_coef"] == w["contingency_coef"]


def test_streaming_entropy_bit_equal_to_batch(spark, tmp_path):
    from carbon_clickhouse_spark.operators.ch_aggregates import entropy_agg
    from carbon_clickhouse_spark.streaming.entropy import (
        finalize_entropy,
        streaming_entropy_cells,
    )

    landing = str(tmp_path / "en")
    os.makedirs(landing)
    rng = random.Random(53)
    rows = [("g%d" % (i % 2), rng.randrange(12)) for i in range(500)]
    cut = len(rows) // 2
    schema = "g string, v int"

    stream = spark.readStream.schema(schema).json(landing)
    q = (
        streaming_entropy_cells(stream, ["g"], "v")
        .writeStream.format("memory")
        .queryName("enc")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", rows[:cut], ("g", "v"))
        q.processAllAvailable()
        _write(landing, "b2.json", rows[cut:], ("g", "v"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    snap_rows = _latest(
        spark.sql("SELECT * FROM enc").collect(), ["g", "__v"], "__c"
    )
    snap = spark.createDataFrame(
        [(r["g"], r["__v"], r["__c"]) for r in snap_rows],
        "g string, __v int, __c long",
    )
    got = {r["g"]: r["entropy"] for r in finalize_entropy(snap, ["g"]).collect()}
    want = {
        r["g"]: r["entropy"]
        for r in entropy_agg(
            spark.createDataFrame(rows, schema), ["g"], "v"
        ).collect()
    }
    assert got == want  # bitwise: quantized terms, exact sums
