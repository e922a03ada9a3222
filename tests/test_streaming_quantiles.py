"""Streaming windowed quantile sketches (streaming/quantiles.py):
watermark-finalized state rows that merge — via the batch
quantile_merge — into exactly the estimates the batch sketch gives
on the same data."""

import json
import os

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.quantile_sketch import (
    quantile_dd,
    quantile_merge,
)
from carbon_clickhouse_spark.streaming.quantiles import (
    streaming_quantile_sketch,
)

SCHEMA = "g string, ts timestamp, v double"


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
    landing = str(tmp_path / "qs")
    os.makedirs(landing)
    base = 1_700_000_000
    rows = [
        ("a", base + i, float((i * 37) % 500) / 7.0 - 10.0)
        for i in range(400)
    ]
    rows += [("b", base + i, float(i % 90) * 3.0) for i in range(300)]
    _write(landing, "b1.json", rows[:500])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    # generous allowance: batch 2 replays event times far behind the
    # stream max, and THIS test is about state mergeability, not late
    # drops (test_late_rows_beyond_watermark_dropped covers those)
    states = streaming_quantile_sketch(
        stream, ["g"], "v", time_col="ts", window="1 minute",
        late_allowance="1 hour",
    )
    q = (
        states.writeStream.format("memory")
        .queryName("qstates")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past every window, then finalize
        _write(
            landing, "b2.json",
            rows[500:] + [("a", base + 10_000, 1.0)],
        )
        q.processAllAvailable()
        _write(landing, "b3.json", [("a", base + 20_000, 1.0)])
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    stored = spark.sql("SELECT * FROM qstates")
    # every original-window row finalized exactly once; windows align
    n_windows = stored.select("g", "win_start").distinct().count()
    assert n_windows >= 2
    assert stored.filter(F.col("win_end") <= F.col("win_start")).count() == 0
    # fold the stored states per group and compare against the batch
    # sketch on the SAME rows (minus the not-yet-final sentinel rows)
    final_rows = [r for r in rows]
    merged = quantile_merge(
        stored.filter(
            F.col("win_start")
            < F.timestamp_seconds(F.lit(base + 5_000))
        ),
        ["g"],
        [0.1, 0.5, 0.9],
    )
    batch = quantile_dd(
        spark.createDataFrame(
            final_rows, "g string, sec long, v double"
        ).select("g", "v"),
        ["g"],
        "v",
        [0.1, 0.5, 0.9],
    )
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    landing = str(tmp_path / "qs2")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(landing, "b1.json", [("a", base + i, 5.0) for i in range(60)])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    states = streaming_quantile_sketch(
        stream, ["g"], "v", window="1 minute",
        late_allowance="5 seconds",
    )
    q = (
        states.writeStream.format("memory")
        .queryName("qstates2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark far ahead, then send a too-late row into
        # the first (already finalized) window
        _write(landing, "b2.json", [("a", base + 7_200, 1.0)])
        q.processAllAvailable()
        _write(landing, "b3.json", [("a", base + 1, 999.0)])
        q.processAllAvailable()
        _write(landing, "b4.json", [("a", base + 7_300, 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    first_win = spark.sql(
        "SELECT sum(cnt) AS c FROM qstates2 "
        f"WHERE win_start = timestamp_seconds({base - (base % 60)})"
    ).collect()[0]["c"]
    # the 999.0 straggler never lands: the first minute holds only
    # its original rows
    assert first_win == 60 - (base % 60)
