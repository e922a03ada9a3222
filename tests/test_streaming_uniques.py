"""Streaming windowed uniqState (streaming/uniques.py): finalized HLL
states merge — via the batch uniq_merge — to the same estimates the
batch uniq_sketch gives on identical data."""

import json
import os

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.ch_aggregates import (
    uniq_merge,
    uniq_sketch,
)
from carbon_clickhouse_spark.streaming.uniques import (
    streaming_uniq_sketch,
)

SCHEMA = "g string, ts timestamp, v string"


def _write(landing, name, rows):
    from datetime import datetime, timezone

    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for g, sec, v in rows:
            ts = datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            f.write(json.dumps({"g": g, "ts": ts, "v": v}) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def test_stream_states_merge_to_batch_estimates(spark, tmp_path):
    landing = str(tmp_path / "uq")
    os.makedirs(landing)
    base = 1_700_000_000
    rows = [
        ("a", base + i, f"user{(i * 13) % 700}") for i in range(900)
    ]
    rows += [("b", base + i, f"u{i % 40}") for i in range(300)]
    _write(landing, "b1.json", rows[:700])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    states = streaming_uniq_sketch(
        stream, ["g"], "v", window="1 minute", late_allowance="1 hour"
    )
    q = (
        states.writeStream.format("memory")
        .queryName("uqstates")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(
            landing, "b2.json",
            rows[700:] + [("a", base + 100_000, "zz")],
        )
        q.processAllAvailable()
        _write(landing, "b3.json", [("a", base + 200_000, "zz")])
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    stored = spark.sql("SELECT * FROM uqstates").filter(
        F.col("win_start") < F.timestamp_seconds(F.lit(base + 50_000))
    )
    assert stored.select("g", "win_start").distinct().count() >= 2
    merged = {
        r["g"]: r["uniq"]
        for r in uniq_merge(stored, ["g"]).collect()
    }
    batch = {
        r["g"]: r["uniq"]
        for r in uniq_merge(
            uniq_sketch(
                spark.createDataFrame(
                    rows, "g string, sec long, v string"
                ),
                ["g"],
                "v",
            ),
            ["g"],
        ).collect()
    }
    # the union of many per-window sketches may differ from one whole
    # sketch by the sparse->dense transition (DataSketches internal
    # modes), but both sit inside HLL error at lg_k=12 (~1.6% rse)
    assert abs(merged["a"] - batch["a"]) / batch["a"] < 0.03
    # small windows stay in exact sparse mode: group b is exact
    assert merged["b"] == batch["b"] == 40
    # and the estimate is near the true distinct count
    assert abs(merged["a"] - 700) / 700 < 0.05


def test_nulls_skipped(spark, tmp_path):
    landing = str(tmp_path / "uq2")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(
        landing, "b1.json",
        [("a", base, "x"), ("a", base + 1, None), ("a", base + 2, "y")],
    )
    stream = spark.readStream.schema(SCHEMA).json(landing)
    states = streaming_uniq_sketch(
        stream, ["g"], "v", window="1 minute", late_allowance="1 second"
    )
    q = (
        states.writeStream.format("memory")
        .queryName("uqstates2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", [("a", base + 10_000, "zz")])
        q.processAllAvailable()
        _write(landing, "b3.json", [("a", base + 20_000, "zz")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = uniq_merge(
        spark.sql("SELECT * FROM uqstates2").filter(
            F.col("win_start")
            < F.timestamp_seconds(F.lit(base + 5_000))
        ),
        ["g"],
    ).collect()
    assert got[0]["uniq"] == 2
