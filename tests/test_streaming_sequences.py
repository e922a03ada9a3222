"""Streaming sequenceCount (streaming/sequences.py): watermark-gated
candidate folding, out-of-order reconstruction, gap bounds, and parity
with the batch operator on replayed data."""

import json
import os
import random
import time

from carbon_clickhouse_spark.operators.sequence_match import (
    sequence_count,
)
from carbon_clickhouse_spark.streaming.sequences import (
    _fold_count,
    streaming_sequence_count,
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
                json.dumps({"user_id": user, "ts": ts, "event_type": ty})
                + "\n"
            )
    os.rename(tmp, os.path.join(landing, name))


def _latest(spark, qname):
    best = {}
    for r in spark.sql(f"SELECT * FROM {qname}").collect():
        cur = best.get(r["user_id"])
        if cur is None or r["ver"] > cur["ver"]:
            best[r["user_id"]] = r
    return best


def _batch_counts(spark, events, types, lo, hi):
    df = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in events],
        "user_id long, time long, event_type string",
    )
    return {
        r["user_id"]: r["n_matches"]
        for r in sequence_count(
            df,
            [f"event_type = '{t}'" for t in types],
            max_gaps=hi,
            min_gaps=lo,
        ).collect()
    }


def test_fold_count_pure_function():
    # two non-overlapping a->b matches; the middle b is consumed
    cand, m = _fold_count(
        [[], []], 0,
        [(10, "a"), (20, "b"), (30, "a"), (45, "b")],
        ["a", "b"], [None], [20],
    )
    assert m == 2
    # min gap: a@10 -> b@20 blocked (gap 10 not > 15), a@10 -> b@40 ok
    _, m2 = _fold_count(
        [[], []], 0, [(10, "a"), (20, "b"), (40, "b")],
        ["a", "b"], [15], [None],
    )
    assert m2 == 1


def test_out_of_order_parity_with_batch(spark, tmp_path):
    landing = str(tmp_path / "sq1")
    os.makedirs(landing)
    base = 1_700_000_000
    rng = random.Random(19)
    events = []
    for u in range(8):
        t = base
        for _ in range(rng.randrange(3, 14)):
            t += rng.randrange(5, 40)
            events.append((u, t, rng.choice("abx")))
    rng.shuffle(events)
    cut = len(events) // 2
    b1, b2 = events[:cut], events[cut:]

    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_count(
        stream, ["a", "b"], max_gaps=[60], min_gaps=[10],
        watermark_delay="10 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sq1")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", b1)
        q.processAllAvailable()
        _write(landing, "b2.json", b2)
        q.processAllAvailable()
        # watermark pushers: freeze everything
        _write(landing, "b3.json", [(0, base + 100_000, "x")])
        q.processAllAvailable()
        _write(landing, "b4.json", [(0, base + 200_000, "x")])
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    got = {u: r["n_matches"] for u, r in _latest(spark, "sq1").items()}
    want = _batch_counts(spark, events, ["a", "b"], [10], [60])
    want = {u: c for u, c in want.items() if c > 0}
    assert got == want, (got, want)


def test_ttl_eviction_folds_buffered_events(spark, tmp_path):
    """TTL eviction folds the whole buffer (no watermark ever froze
    it) and emits the final count instead of dropping it."""
    landing = str(tmp_path / "sq_ttl")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(
        landing,
        "b1.json",
        [(7, base + 10, "a"), (7, base + 20, "b")],
    )
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_count(
        stream, ["a", "b"], max_gaps=[60],
        watermark_delay="10 seconds", state_ttl_seconds=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sq_ttl")
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        time.sleep(6)
        deadline = time.time() + 90
        got = []
        i = 0
        while time.time() < deadline:
            _write(
                landing, f"k{i}.json", [(8, base + 10_000 + i, "x")]
            )
            i += 1
            time.sleep(3)
            assert q.exception() is None, q.exception()
            got = spark.sql(
                "SELECT * FROM sq_ttl WHERE user_id = 7"
            ).collect()
            if got:
                break
        assert got, "TTL expiry never emitted the buffered count"
        assert got[0]["n_matches"] == 1
    finally:
        q.stop()


def _batch_matched(spark, events, types, lo, hi):
    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_match,
    )

    df = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in events],
        "user_id long, time long, event_type string",
    )
    return {
        r["user_id"]: r["matched"]
        for r in sequence_match(
            df,
            [f"event_type = '{t}'" for t in types],
            max_gaps=hi,
            min_gaps=lo,
        ).collect()
    }


def test_streaming_sequence_match_parity_with_batch(spark, tmp_path):
    """Replay parity: the streaming matcher's per-user answer equals
    the batch sequence_match on the same shuffled events — and each
    matched user is emitted EXACTLY once (the answer is monotone)."""
    from carbon_clickhouse_spark.streaming.sequences import (
        streaming_sequence_match,
    )

    landing = str(tmp_path / "sm1")
    os.makedirs(landing)
    base = 1_700_000_000
    rng = random.Random(23)
    events = []
    for u in range(10):
        t = base
        for _ in range(rng.randrange(2, 12)):
            t += rng.randrange(5, 40)
            events.append((u, t, rng.choice("abx")))
    rng.shuffle(events)
    cut = len(events) // 2
    b1, b2 = events[:cut], events[cut:]

    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_match(
        stream, ["a", "b"], max_gaps=[60], min_gaps=[10],
        watermark_delay="10 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sm1")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", b1)
        q.processAllAvailable()
        _write(landing, "b2.json", b2)
        q.processAllAvailable()
        # freeze rounds carry EVERY user's key: a key only re-folds
        # when it receives data, so each user gets a non-step event
        # while the watermark advances past all real timestamps
        _write(
            landing,
            "b3.json",
            [(u, base + 100_000, "x") for u in range(10)],
        )
        q.processAllAvailable()
        _write(
            landing,
            "b4.json",
            [(u, base + 200_000, "x") for u in range(10)],
        )
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sm1 WHERE user_id < 90").collect()
    got = {r["user_id"]: r["matched"] for r in rows}
    # exactly one emission per matched user, all with matched=1, ver=1
    assert len(rows) == len(got)
    assert all(r["matched"] == 1 and r["ver"] == 1 for r in rows)
    want = _batch_matched(spark, events, ["a", "b"], [10], [60])
    want = {u: m for u, m in want.items() if m}
    assert got == want, (got, want)


def test_streaming_sequence_match_watermark_boundary(spark, tmp_path):
    """Strict-below freeze convention: an event arriving at exactly
    ``t == watermark`` is still accepted and completes the chain."""
    from carbon_clickhouse_spark.streaming.sequences import (
        streaming_sequence_match,
    )

    landing = str(tmp_path / "sm_wm")
    os.makedirs(landing)
    base = 1_700_000_000
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_match(
        stream, ["a", "b"], watermark_delay="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sm_wm")
        .outputMode("update")
        .start()
    )
    try:
        # batch 1: the chain head, plus a max-ts event that pushes the
        # watermark to exactly base+90
        _write(
            landing,
            "b1.json",
            [(1, base + 85, "a"), (2, base + 100, "x")],
        )
        q.processAllAvailable()
        # batch 2: the completing event lands AT the watermark
        # (t == base+90 == wm) — strictly-below freezing must accept it
        _write(landing, "b2.json", [(1, base + 90, "b")])
        q.processAllAvailable()
        # freeze pushers carry user 1's key: a stateful key only
        # re-folds when it receives data (or times out), so the
        # advancing watermark must arrive WITH a user-1 row
        _write(landing, "b3.json", [(1, base + 100_000, "x")])
        q.processAllAvailable()
        _write(landing, "b4.json", [(1, base + 200_000, "x")])
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sm_wm WHERE user_id = 1").collect()
    assert len(rows) == 1 and rows[0]["matched"] == 1, rows


def test_streaming_sequence_match_ttl_folds_buffer(spark, tmp_path):
    """TTL eviction of an unmatched user folds the still-buffered
    events and emits if they complete the chain."""
    from carbon_clickhouse_spark.streaming.sequences import (
        streaming_sequence_match,
    )

    landing = str(tmp_path / "sm_ttl")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(
        landing,
        "b1.json",
        [(7, base + 10, "a"), (7, base + 20, "b")],
    )
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_match(
        stream, ["a", "b"], max_gaps=[60],
        watermark_delay="10 seconds", state_ttl_seconds=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sm_ttl")
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        time.sleep(6)
        deadline = time.time() + 90
        got = []
        i = 0
        while time.time() < deadline:
            _write(
                landing, f"k{i}.json", [(8, base + 10_000 + i, "x")]
            )
            i += 1
            time.sleep(3)
            assert q.exception() is None, q.exception()
            got = spark.sql(
                "SELECT * FROM sm_ttl WHERE user_id = 7"
            ).collect()
            if got:
                break
        assert got, "TTL expiry never emitted the buffered match"
        assert got[0]["matched"] == 1
    finally:
        q.stop()


def test_streaming_sequence_next_node_parity_with_batch(spark, tmp_path):
    """head+forward parity: the streaming answer per determined user
    equals the batch sequence_next_node on the same events (pusher
    events included in both — they are part of the stream)."""
    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_next_node,
    )
    from carbon_clickhouse_spark.streaming.sequences import (
        streaming_sequence_next_node,
    )

    landing = str(tmp_path / "snn1")
    os.makedirs(landing)
    base = 1_700_000_000
    rng = random.Random(31)
    events = []
    for u in range(10):
        t = base
        for _ in range(rng.randrange(1, 8)):
            t += rng.randrange(5, 40)
            events.append((u, t, rng.choice("abcx")))
    # four freeze pusher rounds per user: these are REAL stream events
    # (a user's next node may well be one of them). Four rounds, each
    # carrying EVERY user's key, because (a) a key only re-folds when
    # it receives data and (b) the watermark lags one batch — round k
    # freezes round k-2's events
    pushers = [
        [(u, base + 100_000 * (r + 1), "z") for u in range(10)]
        for r in range(4)
    ]
    all_events = events + [e for rnd in pushers for e in rnd]
    rng.shuffle(events)
    cut = len(events) // 2

    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_next_node(
        stream, ["a", "b"], watermark_delay="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("snn1")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", events[:cut])
        q.processAllAvailable()
        _write(landing, "b2.json", events[cut:])
        q.processAllAvailable()
        for r, rnd in enumerate(pushers):
            _write(landing, f"p{r}.json", rnd)
            q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM snn1 WHERE user_id < 90").collect()
    got = {r["user_id"]: r["next_event"] for r in rows}
    assert len(rows) == len(got)  # one emission per determined user

    bdf = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in all_events],
        "user_id long, time long, event_type string",
    )
    want = {
        r["user_id"]: r["next_event"]
        for r in sequence_next_node(
            bdf, ["a", "b"], direction="forward", base="head"
        ).collect()
    }
    # every user got >= 3 frozen events (2 pushers), so every user is
    # determined and must agree with the batch answer incl. NULLs
    for u in range(10):
        assert got.get(u, "MISSING") == want[u], (u, got.get(u), want[u])


def test_streaming_sequence_next_node_ttl_determines_tail(spark, tmp_path):
    """A user whose head run matched but whose next event never came:
    TTL eviction emits the batch-equivalent NULL instead of staying
    silent forever."""
    from carbon_clickhouse_spark.streaming.sequences import (
        streaming_sequence_next_node,
    )

    landing = str(tmp_path / "snn_ttl")
    os.makedirs(landing)
    base = 1_700_000_000
    _write(
        landing,
        "b1.json",
        [(7, base + 10, "a"), (7, base + 20, "b")],
    )
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_next_node(
        stream, ["a", "b"],
        watermark_delay="10 seconds", state_ttl_seconds=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("snn_ttl")
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        time.sleep(6)
        deadline = time.time() + 90
        got = []
        i = 0
        while time.time() < deadline:
            _write(
                landing, f"k{i}.json", [(8, base + 10_000 + i, "x")]
            )
            i += 1
            time.sleep(3)
            assert q.exception() is None, q.exception()
            got = spark.sql(
                "SELECT * FROM snn_ttl WHERE user_id = 7"
            ).collect()
            if got:
                break
        assert got, "TTL expiry never determined the user"
        assert got[0]["next_event"] is None  # matched run, no next
    finally:
        q.stop()


def test_null_user_is_one_group_parity(spark, tmp_path):
    """r11: a NULL user_id is ONE group in the streaming twin (the
    state key) AND in the batch operator (pd.isna-normalized run
    detection) — the NULL user's full a->b chain must count once,
    matching batch replay, not split per row or vanish."""
    landing = str(tmp_path / "sq_null")
    os.makedirs(landing)
    base = 1_700_000_000
    events = [
        (None, base + 10, "a"),
        (None, base + 30, "b"),
        (7, base + 10, "a"),
        (7, base + 30, "b"),
    ]
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_sequence_count(
        stream, ["a", "b"], max_gaps=[60],
        watermark_delay="10 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sq_null")
        .outputMode("update")
        .start()
    )
    try:
        _write(landing, "b1.json", events)
        q.processAllAvailable()
        # advance the watermark, then poke BOTH keys (a key refolds
        # when it receives rows — the documented invocation contract)
        _write(landing, "b2.json", [(0, base + 100_000, "x")])
        q.processAllAvailable()
        _write(
            landing,
            "b3.json",
            [(None, base + 150_000, "x"), (7, base + 150_000, "x")],
        )
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    got = {u: r["n_matches"] for u, r in _latest(spark, "sq_null").items()}
    want = _batch_counts(spark, events, ["a", "b"], [None], [60])
    want = {u: c for u, c in want.items() if c > 0}
    assert want == {None: 1, 7: 1}  # batch keeps the NULL group
    assert got == want, (got, want)
