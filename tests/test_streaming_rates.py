"""Streaming deltaSum (streaming/rates.py): watermark-gated folding,
out-of-order reconstruction, reset semantics, and parity with the
batch operator on replayed data."""

import json
import os

from carbon_clickhouse_spark.operators.events_analytics import delta_sum
from carbon_clickhouse_spark.streaming.rates import streaming_delta_sum

SCHEMA = "path string, time long, value double"


def _write(landing, name, rows):
    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for p, t, v in rows:
            f.write(json.dumps({"path": p, "time": t, "value": v}) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def _start(spark, landing, qname, delay="10 seconds"):
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_delta_sum(stream, watermark_delay=delay)
    return (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .start()
    )


def _latest(spark, qname):
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    best = {}
    for r in rows:
        cur = best.get(r["path"])
        if cur is None or r["ver"] > cur["ver"]:
            best[r["path"]] = r
    return best


def test_out_of_order_parity_with_batch(spark, tmp_path):
    landing = str(tmp_path / "rt1")
    os.makedirs(landing)
    base = 1_700_000_000
    # a counter that climbs, resets, climbs — delivered OUT OF ORDER
    # across batches (batch 2 carries earlier event times)
    series = [
        ("ctr", base + 10, 5.0),
        ("ctr", base + 20, 9.0),
        ("ctr", base + 30, 2.0),   # reset
        ("ctr", base + 40, 6.0),
        ("ctr", base + 50, 7.0),
        ("gau", base + 10, 1.0),
        ("gau", base + 20, 4.0),
    ]
    b1 = [series[0], series[3], series[5]]
    b2 = [series[1], series[2], series[4], series[6]]
    _write(landing, "b1.json", b1)
    q = _start(spark, landing, "rt1")
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", b2)
        q.processAllAvailable()
        # watermark pushers: finalize everything
        _write(landing, "b3.json", [("ctr", base + 10_000, 7.0)])
        q.processAllAvailable()
        _write(landing, "b4.json", [("ctr", base + 20_000, 7.0)])
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = _latest(spark, "rt1")
    batch = {
        r["path"]: r["delta_sum"]
        for r in delta_sum(
            spark.createDataFrame(series, SCHEMA), ["path"], "value", "time"
        ).collect()
    }
    # ctr: +4, reset ignored, +4, +1 = 9; gau: +3
    assert batch == {"ctr": 9.0, "gau": 3.0}
    assert got["ctr"]["delta_sum"] == 9.0
    assert got["gau"]["delta_sum"] == 3.0
    # the b3 sentinel (t=+10000) is NOT folded: the watermark during
    # b4 is still the one b3 computed (9990 < 10000) — Spark publishes
    # watermarks at batch end
    assert got["ctr"]["n_points"] == 5


def test_ttl_eviction_folds_buffered_points(spark, tmp_path):
    """TTL eviction must fold-and-emit still-buffered points rather
    than silently dropping them: an idle series whose points never
    got frozen by a watermark (batch 1 ran with watermark 0) still
    produces its deltaSum when the timeout fires. Uses a real
    trigger interval: processing-time timeouts need batches to keep
    scheduling, so processAllAvailable alone cannot drive this."""
    import time as _time

    landing = str(tmp_path / "rt_ttl")
    os.makedirs(landing)
    base = 1_700_000_000
    # batch 1: watermark is 0 -> nothing folds, both points buffer
    _write(landing, "b1.json", [("ctr", base + 10, 1.0), ("ctr", base + 20, 5.0)])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_delta_sum(
        stream, watermark_delay="10 seconds", state_ttl_seconds=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rt_ttl")
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        _time.sleep(6)
        # keep another series flowing so batches fire; "ctr" stays
        # idle until its TTL expires
        deadline = _time.time() + 90
        got = []
        i = 0
        while _time.time() < deadline:
            _write(landing, f"k{i}.json", [("x", base + 10_000 + i, 1.0)])
            i += 1
            _time.sleep(3)
            assert q.exception() is None, q.exception()
            got = spark.sql(
                "SELECT * FROM rt_ttl WHERE path = 'ctr'"
            ).collect()
            if got:
                break
        assert got, "TTL expiry never emitted the buffered fold"
        assert got[0]["delta_sum"] == 4.0
        assert got[0]["last_time"] == base + 20
        assert got[0]["n_points"] == 2
    finally:
        q.stop()


def test_nothing_folds_before_watermark_exists(spark, tmp_path):
    landing = str(tmp_path / "rt2")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(landing, "b1.json", [("s", base + 1, 1.0), ("s", base + 2, 5.0)])
    q = _start(spark, landing, "rt2")
    try:
        q.processAllAvailable()
        # batch 1 ran with watermark 0: nothing folded, nothing emitted
        assert spark.sql("SELECT * FROM rt2").count() == 0
        _write(landing, "b2.json", [("s", base + 100, 6.0)])
        q.processAllAvailable()
        _write(landing, "b3.json", [("s", base + 200, 6.0)])
        q.processAllAvailable()
        _write(landing, "b4.json", [("s", base + 300, 6.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = _latest(spark, "rt2")
    # +4 (1->5) then +1 (5->6) once the watermark passes t=+100; the
    # later pushers may still sit buffered
    assert got["s"]["delta_sum"] == 5.0
