"""ClickHouse-upload e2e against the in-process CH simulator.

The reference's e2e harness boots carbon-clickhouse + a Dockerized
ClickHouse, feeds the ``tests/plain/test.toml:3-94`` lines over TCP,
and diffs golden SELECTs (``cmd/e2e-test/e2etesting.go:113-155``).
No Docker here, so this drives the identical chain with the HTTP hop
kept REAL: pipeline -> ``sinks.clickhouse`` (gzip POST, retry ladder)
-> a real localhost HTTP server that strictly validates the
ClickHouse INSERT dialect and RowBinary bodies
(``sinks/chsim.ClickHouseSim``) — then asserts the same goldens on
the decoded rows. Table-content goldens for the Spark side live in
``test_golden_e2e.py``; this file proves the bytes on the wire.
"""

import datetime as dt

import pytest

from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables
from carbon_clickhouse_spark.sinks.chsim import ClickHouseSim, decode_rows
from carbon_clickhouse_spark.sinks.clickhouse import (
    insert_points,
    upload_tables,
)
from carbon_clickhouse_spark.sources.plain import parse_plain_lines
from carbon_clickhouse_spark.sources.rowbinary import (
    encode_index_rows,
    encode_tagged_rows,
)

from .test_golden_e2e import INPUT_LINES

DAY = (dt.date(2021, 7, 5) - dt.date(1970, 1, 1)).days  # 1625478240 // 86400
TREE_DAY = 42  # 1970-02-12, the reference's fixed tree date


@pytest.fixture(scope="module")
def sim_rows(spark):
    """Run the full chain once: parse -> derive -> upload all four
    tables over live HTTP (first POST of the wave fails via injection
    to prove the retry ladder on a real socket)."""
    lines = spark.createDataFrame([(l,) for l in INPUT_LINES], ["line"])
    points = parse_plain_lines(lines, now=1625478400)
    tables = {
        k: v.coalesce(1) for k, v in
        derive_tables(points, IngestConfig(now=1625478400)).items()
    }
    sim = ClickHouseSim()
    url = sim.start()
    try:
        sim.fail_next(1)  # transient 500 -> sink must retry, not drop
        upload_tables(tables, url, gzip=True, retries=3, retry_delay_s=0.0)
        yield sim
    finally:
        sim.stop()


def test_points_golden_over_http(sim_rows):
    got = sorted(
        (
            (p, v, t, d, ver)
            for p, v, t, d, ver in sim_rows.rows("graphite")
            if p.startswith("test.")
        ),
        key=lambda r: (r[0], r[2]),
    )
    # test.toml:122-126 (Timestamp column = 0: zero-timestamp upload)
    assert got == [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, DAY, 0),
        ("test.host1.cpu.loadavg", 9.4, 1625478300, DAY, 0),
    ]


def test_points_reverse_golden_over_http(sim_rows):
    got = sorted(
        (
            (p, v, t)
            for p, v, t, d, ver in sim_rows.rows("graphite_reverse")
            if p.endswith(".test")
        ),
        key=lambda r: (r[0], r[2]),
    )
    assert got == [
        ("loadavg.cpu.host1.test", 10.2, 1625478240),
        ("loadavg.cpu.host1.test", 9.4, 1625478300),
    ]


def test_index_golden_over_http(sim_rows):
    got = sorted(
        (d, lvl, p)
        for d, lvl, p, ver in sim_rows.rows("graphite_index")
        if p.startswith("test.") or p.endswith(".test")
    )
    # test.toml:109-120
    assert got == [
        (TREE_DAY, 20001, "test."),
        (TREE_DAY, 20002, "test.host1."),
        (TREE_DAY, 20003, "test.host1.cpu."),
        (TREE_DAY, 20004, "test.host1.cpu.loadavg"),
        (TREE_DAY, 30004, "loadavg.cpu.host1.test"),
        (DAY, 4, "test.host1.cpu.loadavg"),
        (DAY, 10004, "loadavg.cpu.host1.test"),
    ]


def test_tagged_golden_over_http(sim_rows):
    rows = [
        r for r in sim_rows.rows("graphite_tagged")
        if r[2].startswith("cpu.loadavg")
    ]
    # test.toml:136-141
    expected_tags = ["__name__=cpu.loadavg", "env=test", "host=host1"]
    assert sorted((d, t1, p) for d, t1, p, tags, ver in rows) == [
        (DAY, "__name__=cpu.loadavg", "cpu.loadavg?env=test&host=host1"),
        (DAY, "env=test", "cpu.loadavg?env=test&host=host1"),
        (DAY, "host=host1", "cpu.loadavg?env=test&host=host1"),
    ]
    assert all(sorted(tags) == expected_tags for _, _, _, tags, _ in rows)
    # spec_symbols escaping survives the wire (test.toml:146-160)
    spec = {
        t1 for _, t1, p, _, _ in sim_rows.rows("graphite_tagged")
        if p.startswith("spec_symbols?")
    }
    assert "hash=#" in spec and "forward/0=/0" in spec
    # non-ascii path percent-encodes, tag values stay raw (:165-176)
    nona = [
        (p, tags) for _, t1, p, tags, _ in sim_rows.rows("graphite_tagged")
        if p.startswith("non-ascii.")
    ]
    assert nona and all(
        p == "non-ascii.%D0%B8%D0%B2%D0%B0%D0%BD?tagged=true"
        and "__name__=non-ascii.иван" in tags
        for p, tags in nona
    )


def test_retry_ladder_ran_on_real_socket(sim_rows):
    """The injected 500 means at least one request was retried; no
    row may be lost and the failed body must not have landed."""
    assert any(
        r["n_bytes"] > 0 for r in sim_rows.requests
    )
    assert len(sim_rows.requests) >= 5  # 4 tables + >=1 retry
    # gzip was on for every upload
    assert all(
        r["headers"].get("Content-Encoding") == "gzip"
        for r in sim_rows.requests
    )


def test_strict_decoder_rejects_torn_bodies():
    body = encode_index_rows([(DAY, 4, "a.b.c.d", 0)])
    with pytest.raises(ValueError):
        decode_rows(body[:-1], "index")
    body2 = encode_tagged_rows([(DAY, "a=b", "m?a=b", ["__name__=m", "a=b"], 0)])
    assert decode_rows(body2, "tagged") == [
        (DAY, "a=b", "m?a=b", ["__name__=m", "a=b"], 0)
    ]
    with pytest.raises(ValueError):
        decode_rows(body2 + b"\x01", "tagged")


def test_sim_rejects_bad_insert_and_unknown_table(spark):
    sim = ClickHouseSim()
    url = sim.start()
    try:
        df = spark.createDataFrame(
            [("a.b", 1.0, 1625478240, 0)],
            "path STRING, value DOUBLE, time LONG, version LONG",
        ).coalesce(1)
        with pytest.raises(Exception, match="clickhouse insert failed"):
            insert_points(
                df, url, "no_such_table", gzip=False,
                retries=0, retry_delay_s=0.0,
            )
    finally:
        sim.stop()
