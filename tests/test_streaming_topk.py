"""Streaming topK (streaming/topk.py): exactness when slots cover the
alphabet, SpaceSaving bounds under eviction, cross-batch
accumulation, and snapshot versioning."""

import json
import os
import random

from carbon_clickhouse_spark.operators.ch_aggregates import top_k
from carbon_clickhouse_spark.streaming.topk import streaming_top_k

SCHEMA = "g string, v string"


def _write(landing, name, rows):
    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for g, v in rows:
            f.write(json.dumps({"g": g, "v": v}) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def _start(spark, landing, qname, k=3, oversample=4):
    stream = spark.readStream.schema(SCHEMA).json(landing)
    out = streaming_top_k(stream, ["g"], "v", k=k, oversample=oversample)
    return (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .start()
    )


def _latest(spark, qname):
    """Rows of each group's highest-ver snapshot."""
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    maxver = {}
    for r in rows:
        maxver[r["g"]] = max(maxver.get(r["g"], 0), r["ver"])
    return [r for r in rows if r["ver"] == maxver[r["g"]]]


def test_exact_when_slots_cover_alphabet(spark, tmp_path):
    landing = str(tmp_path / "tk1")
    os.makedirs(landing)
    rng = random.Random(5)
    rows = [("a", rng.choice("xyzw")) for _ in range(300)]
    rows += [("b", rng.choice("pq")) for _ in range(100)]
    _write(landing, "b1.json", rows[:200])
    q = _start(spark, landing, "tk1", k=3, oversample=4)
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", rows[200:])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["g"], r["value"]): (r["cnt_lower"], r["cnt_upper"], r["rnk"])
        for r in _latest(spark, "tk1")
    }
    batch = spark.createDataFrame(rows, SCHEMA)
    want = {
        (r["g"], r["value"]): (r["cnt"], r["cnt"], r["rnk"])
        for r in top_k(batch, ["g"], "v", k=3).collect()
    }
    # slots (12) >= alphabet per group -> exact counts, zero error
    assert got == want


def test_bounds_and_heavy_hitter_under_eviction(spark, tmp_path):
    landing = str(tmp_path / "tk2")
    os.makedirs(landing)
    rng = random.Random(11)
    # 1 heavy value + a long tail wider than the 4 slots
    rows = [("g", "HH") for _ in range(120)]
    rows += [("g", f"t{rng.randrange(40)}") for _ in range(160)]
    rng.shuffle(rows)
    _write(landing, "b1.json", rows[:140])
    q = _start(spark, landing, "tk2", k=2, oversample=2)
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", rows[140:])
        q.processAllAvailable()
    finally:
        q.stop()
    latest = _latest(spark, "tk2")
    true = {}
    for _, v in rows:
        true[v] = true.get(v, 0) + 1
    # heavy hitter (freq 120 > n/slots = 280/4) must be present & #1
    by_rank = {r["rnk"]: r for r in latest}
    assert by_rank[1]["value"] == "HH"
    for r in latest:
        t = true.get(r["value"], 0)
        assert r["cnt_lower"] <= t <= r["cnt_upper"], r
    assert all(r["n"] == len(rows) for r in latest)


def test_versions_increment_per_emitting_batch(spark, tmp_path):
    landing = str(tmp_path / "tk3")
    os.makedirs(landing)
    _write(landing, "b1.json", [("a", "x")] * 3)
    q = _start(spark, landing, "tk3", k=1)
    try:
        q.processAllAvailable()
        _write(landing, "b2.json", [("a", "x"), ("a", "y")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM tk3 ORDER BY ver").collect()
    assert [r["ver"] for r in rows] == [1, 2]
    assert rows[-1]["cnt_upper"] == 4 and rows[-1]["n"] == 5


def test_nulls_skipped_and_bad_params(spark, tmp_path):
    import pytest

    landing = str(tmp_path / "tk4")
    os.makedirs(landing)
    _write(landing, "b1.json", [("a", "x"), ("a", None), ("a", "x")])
    q = _start(spark, landing, "tk4", k=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM tk4").collect()
    assert len(rows) == 1 and rows[0]["n"] == 2
    df = spark.createDataFrame([("a", "x")], SCHEMA)
    with pytest.raises(ValueError):
        streaming_top_k(df, ["g"], "v", k=0)
