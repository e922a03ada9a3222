"""Focused pins for the r12 optimization round's internal changes:
the Huffman prefix-LUT fast path must be indistinguishable from the
bitwise walk, and the fused multi-rule-set rollup must equal the
union of single rollup passes row-for-row."""

import random

import pytest

from carbon_clickhouse_spark.datapipe.multimodal import (
    _HuffTable,
    _JpegBitReader,
    _jpeg_huff_decode_table,
)


def _random_canonical_table(rng, max_len=8, n_syms=12):
    """A valid canonical Huffman spec: lengths assigned greedily so
    the code space never overflows."""
    bits = [0] * 16
    space = 1.0
    length = 1
    remaining = n_syms
    while remaining and length <= max_len:
        take = rng.randint(0, min(remaining, int(space * (1 << length))))
        if length == max_len or length == 16:
            take = min(remaining, int(space * (1 << length)))
        bits[length - 1] = take
        space -= take / (1 << length)
        remaining -= take
        length += 1
        if space <= 0:
            break
    n = sum(bits)
    vals = list(range(n))
    return bits, vals


def test_huff_lut_matches_bitwise_walk_on_random_streams():
    rng = random.Random(7)
    for trial in range(50):
        bits, vals = _random_canonical_table(rng)
        if not sum(bits):
            continue
        table = _jpeg_huff_decode_table(bits, vals)
        assert isinstance(table, _HuffTable)
        # the same spec as a PLAIN dict exercises the slow path
        plain = dict(table)
        # random payload incl. stuffed FFs and a trailing marker
        body = bytes(rng.randrange(256) for _ in range(40))
        body = body.replace(b"\xff", b"\xff\x00") + b"\xff\xd9"
        fast = _JpegBitReader(body, 0)
        slow = _JpegBitReader(body, 0)
        # interleave huff with extension-bit reads and marker syncs:
        # the fast path may BUFFER further ahead than the lazy walk
        # (that is the optimization), but every value either reader
        # ever surfaces — symbols, read() bits, markers — must match
        for step in range(200):
            a = fast.huff(table)
            b = slow.huff(plain)
            assert a == b, f"trial {trial} step {step}: {a} != {b}"
            if a is None:
                assert fast.sync_marker() == slow.sync_marker()
                break
            if step % 3 == 0:
                n = 1 + (step % 5)
                assert fast.read(n) == slow.read(n), f"trial {trial} read"


def test_huff_lut_skips_malformed_overflowing_dht():
    # 3 codes at length 1 overflow the code space; the bitwise walk
    # can never match code >= 2 at length 1, and the LUT build must
    # neither crash nor admit those entries
    bits = [3] + [0] * 15
    vals = [10, 11, 12]
    table = _jpeg_huff_decode_table(bits, vals)
    plain = dict(table)
    payload = bytes([0b10110100, 0x55]) + b"\xff\xd9"
    fast = _JpegBitReader(payload, 0)
    slow = _JpegBitReader(payload, 0)
    for _ in range(8):
        assert fast.huff(table) == slow.huff(plain)


def test_huff_lut_marker_truncated_tail_falls_back():
    # a valid 2-bit code sits right before the marker with maxlen=5:
    # the fast path cannot buffer 5 bits and must fall back to the
    # walk, matching the plain-dict reader bit for bit
    bits = [0, 1, 0, 0, 1] + [0] * 11  # one 2-bit code, one 5-bit code
    vals = [5, 9]
    table = _jpeg_huff_decode_table(bits, vals)
    plain = dict(table)
    payload = bytes([0b00000000]) + b"\xff\xd9"
    fast = _JpegBitReader(payload, 0)
    slow = _JpegBitReader(payload, 0)
    for _ in range(6):
        a, b = fast.huff(table), slow.huff(plain)
        assert a == b
        if a is None:
            break


@pytest.fixture(scope="module")
def spark():
    from carbon_clickhouse_spark.session import get_spark

    return get_spark(
        app_name="test-r12-opt", master="local[4]", shuffle_partitions=8
    )


def test_rollup_sets_equals_union_of_rollups(spark):
    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.operators.rollup import (
        Retention,
        RollupRule,
        rollup,
        rollup_sets,
    )

    rng = random.Random(3)
    rows = [
        (
            rng.choice(["a.click", "a.error", "b.purchase", "c.other"]),
            1706000000 + rng.randrange(40 * 86400),
            round(rng.uniform(0, 100), 2),
        )
        for _ in range(500)
    ]
    pts = spark.createDataFrame(rows, "path string, time long, value double")
    fn_rules = (
        RollupRule(r"\.click$", "sum"),
        RollupRule(r"\.error$", "max"),
        RollupRule("", "avg"),
    )
    now = 1709000000
    ret_rules = (
        RollupRule("", "avg", (Retention(0, 3600), Retention(7 * 86400, 86400))),
    )
    hourly = rollup(
        pts, fn_rules, precision_s=3600, exact_decimal=True, round_avg_to=4
    ).select(F.lit("h").alias("rule_set"), "path", "time", "value")
    ret = rollup(
        pts, ret_rules, now=now, exact_decimal=True, round_avg_to=4
    ).select(F.lit("r").alias("rule_set"), "path", "time", "value")
    expect = sorted(
        (r["rule_set"], r["path"], r["time"], r["value"])
        for r in hourly.unionByName(ret).collect()
    )
    fused = rollup_sets(
        pts,
        [("h", fn_rules, 3600, None), ("r", ret_rules, None, now)],
        exact_decimal=True,
        round_avg_to=4,
    )
    got = sorted(
        (r["rule_set"], r["path"], r["time"], r["value"])
        for r in fused.collect()
    )
    assert got == expect
