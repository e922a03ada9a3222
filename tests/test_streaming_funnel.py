"""Streaming windowFunnel (streaming/funnel.py): watermark-gated
folding, out-of-order correctness, milestone emission, and parity
with the batch operator on replayed data."""

import json
import os
import random

from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.events_analytics import (
    window_funnel,
)
from carbon_clickhouse_spark.streaming.funnel import (
    _fold,
    streaming_window_funnel,
)

SCHEMA = "user_id long, ts timestamp, event_type string"


def _write(landing, name, events):
    from datetime import datetime, timezone

    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for user, sec, ty in events:
            ts = datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            f.write(
                json.dumps(
                    {"user_id": user, "ts": ts, "event_type": ty}
                )
                + "\n"
            )
    os.rename(tmp, os.path.join(landing, name))


def _start(spark, landing, qname, steps, window, delay):
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_window_funnel(
        stream, steps, window, watermark_delay=delay
    )
    return (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )


def test_fold_matches_batch_dp():
    # pure-function check of the shared DP
    ev = [(100, "a"), (150, "b"), (300, "a"), (360, "b"), (400, "c")]
    levels, reached = _fold([None, None, None], ev, ["a", "b", "c"], 120)
    # chain a@300 b@360 c@400 fits in 120; a@100 b@150 c@? misses
    assert levels[2] is not None
    assert reached[2] == 400  # the completing event's time


def test_streaming_funnel_milestones_and_watermark(spark, tmp_path):
    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    # batch 1: user1 completes a->b->c; user2 starts only
    _write(
        landing,
        "b1.json",
        [(1, 100, "a"), (1, 200, "b"), (1, 250, "c"), (2, 300, "a")],
    )
    q = _start(spark, landing, "funnel_t1", ["a", "b", "c"], 3600, "30 seconds")
    try:
        q.processAllAvailable()
        # watermark still at 0 during batch 1 -> nothing folded yet
        assert spark.sql("SELECT * FROM funnel_t1").count() == 0
        # batch 2 rows advance the watermark past batch 1's events and
        # invoke both user groups
        _write(landing, "b2.json", [(1, 10_000, "zz"), (2, 10_000, "zz")])
        q.processAllAvailable()
        got = {
            r.user_id: (r.funnel_level, r.reached_at)
            for r in spark.sql("SELECT * FROM funnel_t1").collect()
        }
        # watermark during batch 2 = 300 - 30 = 270: user1's whole
        # chain is frozen; user2's a@300 is NOT yet (300 > 270)
        assert got == {1: (3, 250)}
        # batch 3 advances the watermark past 300 -> user2's milestone
        # lands; user1 has nothing new -> no duplicate rows
        _write(landing, "b3.json", [(1, 20_000, "zz"), (2, 20_000, "zz")])
        q.processAllAvailable()
        got = {
            r.user_id: (r.funnel_level, r.reached_at)
            for r in spark.sql("SELECT * FROM funnel_t1").collect()
        }
        assert got == {1: (3, 250), 2: (1, 300)}
        assert (
            spark.sql("SELECT * FROM funnel_t1 WHERE user_id = 1").count()
            == 1
        )
    finally:
        q.stop()


def test_streaming_funnel_out_of_order_within_watermark(spark, tmp_path):
    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    # c arrives before b; the 10-minute watermark delay holds folding
    # until the full prefix is frozen, so order is reconstructed
    _write(landing, "b1.json", [(3, 1000, "a"), (3, 1400, "c")])
    q = _start(
        spark, landing, "funnel_t2", ["a", "b", "c"], 3600, "10 minutes"
    )
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", [(3, 1250, "b")])
        q.processAllAvailable()
        _write(landing, "b3.json", [(3, 100_000, "zz")])
        q.processAllAvailable()
        _write(landing, "b4.json", [(3, 100_001, "zz")])
        q.processAllAvailable()
        got = {
            r.user_id: r.funnel_level
            for r in spark.sql("SELECT * FROM funnel_t2").collect()
        }
        assert got == {3: 3}
    finally:
        q.stop()


def test_streaming_funnel_reached_at_is_completing_event(spark, tmp_path):
    """reached_at must be the event that completed the new deepest
    step — not the last frozen event, which may be unrelated."""
    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    _write(
        landing,
        "b1.json",
        [(5, 100, "a"), (5, 200, "b"), (5, 250, "c"), (5, 900, "x")],
    )
    q = _start(spark, landing, "funnel_t4", ["a", "b", "c"], 3600, "30 seconds")
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", [(5, 10_000, "zz")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_t4").collect()
        assert [(r.user_id, r.funnel_level, r.reached_at) for r in rows] == [
            (5, 3, 250)
        ]
    finally:
        q.stop()


def test_streaming_sessions_native_windows(spark, tmp_path):
    from carbon_clickhouse_spark.streaming.funnel import (
        streaming_sessions,
    )

    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    # user 1: two bursts 100..160 and 2000..2030 (gap 60s splits
    # them); user 2: one event
    _write(
        landing,
        "b1.json",
        [
            (1, 100, "a"), (1, 130, "b"), (1, 160, "a"),
            (1, 2000, "a"), (1, 2030, "b"),
            (2, 500, "a"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sessions(
        stream, gap="60 seconds", watermark_delay="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_t1")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past everything to finalize
        _write(landing, "b2.json", [(99, 100_000, "zz")])
        q.processAllAvailable()
        _write(landing, "b3.json", [(99, 100_100, "zz")])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, unix_timestamp(session_start) AS s, "
            "unix_timestamp(session_end) AS e, n_events FROM sess_t1 "
            "WHERE user_id IN (1, 2) ORDER BY user_id, s"
        ).collect()
        got = [(r.user_id, r.s, r.e, r.n_events) for r in rows]
        # session end = last event + gap (native convention)
        assert got == [
            (1, 100, 220, 3),
            (1, 2000, 2090, 2),
            (2, 500, 560, 1),
        ]
    finally:
        q.stop()


def test_streaming_funnel_ttl_flushes_before_eviction(spark, tmp_path):
    """A TTL-evicted idle user still gets a final milestone for
    whatever the watermark had frozen when the timeout fired —
    completed progress of quiet users isn't silently lost. Uses a
    real trigger interval: processing-time timeouts keep scheduling
    batches, so processAllAvailable (which waits for quiescence)
    cannot drive this path.

    Timing-dependent by nature: the timeout may fire when the
    watermark has frozen only a@100 (level 1) or both events
    (level 2) — both are correct TTL-eviction outcomes; what must
    hold is that SOME milestone for the idle user appears, carrying
    the completing event's time, with the stream healthy."""
    import time as _time

    from carbon_clickhouse_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    _write(landing, "b1.json", [(7, 100, "a"), (7, 150, "b")])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_window_funnel(
        stream,
        ["a", "b"],
        3600,
        watermark_delay="10 seconds",
        state_ttl_seconds=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_ttl")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        _time.sleep(6)
        # keep OTHER users' rows flowing so batches fire and the
        # watermark advances; user 7 stays idle until its TTL expires
        deadline = _time.time() + 90
        got = []
        i = 0
        while _time.time() < deadline:
            _write(landing, f"k{i}.json", [(8, 10_000 + i, "x")])
            i += 1
            _time.sleep(3)
            assert q.exception() is None, q.exception()
            got = [
                (r.funnel_level, r.reached_at)
                for r in spark.sql(
                    "SELECT * FROM funnel_ttl WHERE user_id = 7"
                ).collect()
            ]
            if got:
                break
        assert got, "TTL expiry never emitted the idle user's milestone"
        assert got[0] in [(1, 100), (2, 150)], got
    finally:
        q.stop()


def test_streaming_funnel_parity_with_batch(spark, tmp_path):
    rng = random.Random(7)
    users = range(12)
    events = []
    for u in users:
        n_ev = rng.randint(1, 10)
        # unique per-user times: equal-timestamp tie order is an
        # explicit tiebreak_col concern, not what this test targets
        for t in rng.sample(range(1000, 5000), n_ev):
            events.append((u, t, rng.choice(["a", "b", "c", "x"])))
    landing = str(tmp_path / "ev")
    os.makedirs(landing)
    # deliver in shuffled order across three batches (arbitrary
    # disorder; the 2-hour delay keeps everything above the watermark)
    shuffled = events[:]
    rng.shuffle(shuffled)
    thirds = [shuffled[i::3] for i in range(3)]
    q = _start(spark, landing, "funnel_t3", ["a", "b", "c"], 900, "2 hours")
    try:
        for i, chunk in enumerate(thirds):
            _write(landing, f"b{i}.json", chunk)
            q.processAllAvailable()
        # two sentinel waves: first advances the watermark past the
        # data, second folds it for every user group
        for wave, sec in (("s1", 10_000_000), ("s2", 10_000_001)):
            _write(landing, f"{wave}.json", [(u, sec, "zz") for u in users])
            q.processAllAvailable()
        stream_levels = {
            r.user_id: r.funnel_level
            for r in spark.sql(
                "SELECT user_id, max(funnel_level) AS funnel_level "
                "FROM funnel_t3 GROUP BY user_id"
            ).collect()
        }
    finally:
        q.stop()
    batch = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in events],
        "user_id long, time long, event_type string",
    )
    want = {
        r.user_id: r.funnel_level
        for r in window_funnel(batch, ["a", "b", "c"], 900).collect()
        if r.funnel_level > 0
    }
    assert stream_levels == want
