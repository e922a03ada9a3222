"""Snapshot-recompute streaming (streaming/snapshot.py): the decayed
family's executable streaming contract. Every per-batch snapshot
must be BIT-IDENTICAL to the batch operator run over exactly the
rows landed so far — equality, not approximation — including after
a t_max-raising batch that would corrupt any incremental fold."""

import math
import os
import random

from carbon_clickhouse_spark.operators.ch_aggregates import (
    exponential_smoothing,
    exponential_time_decayed,
)
from carbon_clickhouse_spark.streaming.snapshot import snapshot_stream

SCHEMA = "g string, v double, t double"


def _write(landing, name, rows):
    import json

    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for g, v, t in rows:
            f.write(json.dumps({"g": g, "v": v, "t": t}) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def _as_map(rows, cols):
    return {r["g"]: tuple(r[c] for c in cols) for r in rows}


def _assert_bit_equal(a, b):
    assert set(a) == set(b)
    for g in a:
        for x, y in zip(a[g], b[g]):
            if isinstance(x, float) and math.isnan(x):
                assert math.isnan(y), g
            else:
                assert x == y, (g, x, y)


def test_snapshots_bit_equal_to_batch_at_each_moment(spark, tmp_path):
    """Three micro-batches — the later ones RAISE t_max for existing
    groups (the exact shape an incremental fold cannot absorb) and
    add a NULL group key. After each batch the published snapshot
    must equal the batch operator over the union of batches landed
    so far, value for value."""
    landing = str(tmp_path / "landing")
    accum = str(tmp_path / "accum")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    rng = random.Random(59)

    batches = [
        [("g%d" % (i % 3), rng.uniform(-10, 30), float(1000 + 3 * i))
         for i in range(120)],
        # t_max jumps far ahead for every group + a NULL-key group
        [("g%d" % (i % 3), rng.uniform(-10, 30), float(5000 + 7 * i))
         for i in range(90)]
        + [(None, rng.uniform(0, 5), float(5000 + i)) for i in range(10)],
        [("g%d" % (i % 4), rng.uniform(-10, 30), float(9000 + 2 * i))
         for i in range(80)],
    ]

    snapshots = {}

    def publish(df, batch_id):
        snapshots[batch_id] = df.collect()

    stream = spark.readStream.schema(SCHEMA).json(landing)
    q = snapshot_stream(
        stream,
        accum,
        lambda df: exponential_time_decayed(df, ["g"], "v", "t", 11.0),
        publish,
        checkpoint=ckpt,
    )
    cols = ("decayed_sum", "decayed_count", "decayed_max")
    try:
        seen = []
        for i, rows in enumerate(batches):
            _write(landing, f"b{i}.json", rows)
            q.processAllAvailable()
            assert q.exception() is None, q.exception()
            seen += rows
            batch_df = spark.createDataFrame(seen, SCHEMA)
            want = _as_map(
                exponential_time_decayed(
                    batch_df, ["g"], "v", "t", 11.0
                ).collect(),
                cols,
            )
            got = _as_map(snapshots[max(snapshots)], cols)
            _assert_bit_equal(got, want)
    finally:
        q.stop()


def test_snapshot_retry_is_idempotent(spark, tmp_path):
    """foreachBatch retries re-run a batch id: the per-batch-directory
    overwrite must leave the accumulation identical, so a recomputed
    snapshot stays bit-equal instead of double-counting."""
    accum = str(tmp_path / "accum")
    rows = [("g", float(i), float(1000 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    # simulate the landing step running twice for the same batch id
    for _ in range(2):
        df.write.mode("overwrite").parquet(os.path.join(accum, "batch=0"))
    acc = spark.read.option("recursiveFileLookup", "true").parquet(accum)
    assert acc.count() == 50
    got = _as_map(
        exponential_smoothing(acc, ["g"], "v", "t", 7.0, 11.0).collect(),
        ("ema", "decayed_avg"),
    )
    want = _as_map(
        exponential_smoothing(df, ["g"], "v", "t", 7.0, 11.0).collect(),
        ("ema", "decayed_avg"),
    )
    _assert_bit_equal(got, want)


def test_snapshot_contract_reusable_lttb(spark, tmp_path):
    """snapshot_stream is GENERIC (r12, verdict #5): the same
    accumulate-and-recompute harness pins a second anchor-bearing
    family — LTTB, whose bucket boundaries derive from the group's
    TOTAL row count and whose first/last anchors move whenever a
    batch extends the series, so no incremental state can fold it.
    Every per-batch snapshot must be bit-identical to the batch
    operator over the rows landed so far, including batches that
    EXTEND the x-range (moving the last-point anchor and every
    bucket boundary) and a NULL group key."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets,
    )

    landing = str(tmp_path / "landing")
    accum = str(tmp_path / "accum")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    rng = random.Random(61)

    batches = [
        [("s%d" % (i % 2), rng.uniform(-5, 40), float(1000 + 10 * i))
         for i in range(60)],
        # extends every series' x-range: last anchor + ALL bucket
        # boundaries move; adds a NULL series key
        [("s%d" % (i % 2), rng.uniform(-5, 40), float(4000 + 10 * i))
         for i in range(50)]
        + [(None, rng.uniform(0, 5), float(4000 + 10 * i))
           for i in range(12)],
        [("s%d" % (i % 3), rng.uniform(-5, 40), float(8000 + 10 * i))
         for i in range(40)],
    ]

    # rows land as (g, v=y, t=x) to reuse the stream schema
    snapshots = {}

    def publish(df, batch_id):
        snapshots[batch_id] = df.collect()

    def compute(df):
        return largest_triangle_three_buckets(
            df, ["g"], "t", "v", n_out=6
        )

    stream = spark.readStream.schema(SCHEMA).json(landing)
    q = snapshot_stream(
        stream, accum, compute, publish, checkpoint=ckpt,
        query_name="snapshot_lttb",
    )
    try:
        seen = []
        for i, rows in enumerate(batches):
            _write(landing, f"b{i}.json", rows)
            q.processAllAvailable()
            assert q.exception() is None, q.exception()
            seen += rows
            batch_df = spark.createDataFrame(seen, SCHEMA)
            want = {
                (r["g"], r["rnk"]): (r["x"], r["y"])
                for r in compute(batch_df).collect()
            }
            got = {
                (r["g"], r["rnk"]): (r["x"], r["y"])
                for r in snapshots[max(snapshots)]
            }
            assert set(got) == set(want)
            for k in want:
                assert got[k] == want[k], (k, got[k], want[k])  # bit-equal
    finally:
        q.stop()


def test_snapshot_contract_reusable_histogram(spark, tmp_path):
    """Third anchor-bearing family through the SAME harness (r12):
    histogram(N)'s adaptive bins are a greedy merge over ALL values
    seen, and the outer edges are the group's true min/max — a batch
    with a new global min or max retroactively moves every bin
    boundary, so no incremental state can fold it. Each snapshot must
    be bit-identical to the exact-mode batch operator over the rows
    landed so far, including a min/max-extending batch and a NULL
    group key."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    landing = str(tmp_path / "landing")
    accum = str(tmp_path / "accum")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    rng = random.Random(43)

    batches = [
        [("h%d" % (i % 2), rng.uniform(0, 10), float(i))
         for i in range(80)],
        # extends both groups' value range on BOTH ends (every bin
        # edge moves) and adds a NULL group key
        [("h0", -7.5, 1000.0), ("h0", 23.25, 1001.0),
         ("h1", -2.0, 1002.0), ("h1", 99.0, 1003.0)]
        + [(None, rng.uniform(0, 3), float(2000 + i))
           for i in range(15)],
        [("h%d" % (i % 3), rng.uniform(2, 8), float(3000 + i))
         for i in range(40)],
    ]

    snapshots = {}

    def publish(df, batch_id):
        snapshots[batch_id] = df.collect()

    def compute(df):
        return histogram_adaptive(df, "v", bins=5, group_cols=["g"])

    stream = spark.readStream.schema(SCHEMA).json(landing)
    q = snapshot_stream(
        stream, accum, compute, publish, checkpoint=ckpt,
        query_name="snapshot_hist",
    )
    try:
        seen = []
        for i, rows in enumerate(batches):
            _write(landing, f"b{i}.json", rows)
            q.processAllAvailable()
            assert q.exception() is None, q.exception()
            seen += rows
            batch_df = spark.createDataFrame(seen, SCHEMA)
            want = {
                (r["g"], r["bin"]): (r["lower"], r["upper"], r["height"])
                for r in compute(batch_df).collect()
            }
            got = {
                (r["g"], r["bin"]): (r["lower"], r["upper"], r["height"])
                for r in snapshots[max(snapshots)]
            }
            assert set(got) == set(want)
            for k in want:
                assert got[k] == want[k], (k, got[k], want[k])  # bit-equal
    finally:
        q.stop()
