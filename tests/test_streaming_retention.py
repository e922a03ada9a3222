"""Streaming cohort retention (streaming/retention.py): watermark-
gated anchoring, out-of-order reconstruction, exactly-once activation
rows, and parity with the batch operator on replayed data."""

import json
import os
import random
import time

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.events_analytics import (
    retention_cohorts,
)
from carbon_clickhouse_spark.streaming.retention import (
    _fold_retention,
    streaming_retention,
)

SCHEMA = "user_id long, ts timestamp, event_type string"
DAY = 86400


def _write(landing, name, events):
    from datetime import datetime, timezone

    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for user, sec, ty in events:
            ts = datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            f.write(
                json.dumps({"user_id": user, "ts": ts, "event_type": ty})
                + "\n"
            )
    os.rename(tmp, os.path.join(landing, name))


def test_fold_retention_pure_function():
    base_day = 19_000
    t0 = base_day * DAY
    anchor, emitted, acts = _fold_retention(
        None, set(),
        [(t0 - DAY, "view"),            # pre-anchor: ignored
         (t0 + 10, "signup"),           # anchor (day 19000), off 0
         (t0 + 20, "signup"),           # later anchor: no re-anchor
         (t0 + DAY + 5, "view"),        # off 1
         (t0 + 2 * DAY, "view")],       # off 2 not requested
        "signup", {0, 1, 7},
    )
    assert anchor == base_day
    assert emitted == {0, 1}
    assert acts == [(base_day, 0), (base_day, 1)]


def test_out_of_order_parity_with_batch(spark, tmp_path):
    landing = str(tmp_path / "rt")
    os.makedirs(landing)
    base = 1_700_006_400  # 2023-11-15 00:00 UTC
    rng = random.Random(31)
    events = []
    for u in range(10):
        t = base + rng.randrange(0, DAY)
        for _ in range(rng.randrange(2, 12)):
            events.append(
                (u, t, rng.choice(["signup", "view", "click"]))
            )
            t += rng.randrange(3600, 2 * DAY)
    rng.shuffle(events)
    cut = len(events) // 2
    offsets = (0, 1, 3, 7)

    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_retention(
        stream, "signup", offsets, watermark_delay="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ret")
        .outputMode("append")
        .start()
    )
    try:
        _write(landing, "b1.json", events[:cut])
        q.processAllAvailable()
        _write(landing, "b2.json", events[cut:])
        q.processAllAvailable()
        _write(landing, "b3.json", [(99, base + 100 * DAY, "x")])
        q.processAllAvailable()
        _write(landing, "b4.json", [(99, base + 200 * DAY, "x")])
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()

    acts = spark.sql("SELECT * FROM ret").collect()
    # exactly-once per (user, offset)
    keys = [(r["user_id"], r["day_offset"]) for r in acts]
    assert len(keys) == len(set(keys))
    got = {}
    for r in acts:
        k = (str(r["cohort"]), r["day_offset"])
        got[k] = got.get(k, 0) + 1

    batch_df = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in events],
        "user_id long, time long, event_type string",
    ).select(
        "user_id",
        F.to_date(F.timestamp_seconds("time")).alias("date"),
        "event_type",
    )
    want = {
        (str(r["cohort"]), r["day_offset"]): r["n_active"]
        for r in retention_cohorts(
            batch_df, "signup", offsets
        ).collect()
    }
    assert got == want, (got, want)
