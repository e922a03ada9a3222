"""EVERY verify block of the reference's e2e suites — tests/plain,
tests/plain-nodaily, tests/tls — run against the ClickHouse-dialect
view layer and diffed line-by-line against the golden outputs,
mirroring what cmd/e2e-test/e2etesting.go:113-155,230-259 does over a
live ClickHouse (POST query -> TSV -> tabs-to-spaces -> line compare).

The blocks are parsed from the reference's own test.toml files at run
time, so new verify blocks upstream would flow in unchanged. The only
dialect edit is arraySort -> array_sort; table names route through
``register_clickhouse_views(names=...)`` because the reference names
its tables per deployment config (these suites call the tagged table
``graphite_tags``).

The tls suite's transport (mTLS to ClickHouse) is exercised separately
by the chsim e2e tests (tests/test_ch_e2e.py); here its verify SQL and
goldens run like the others — identical table contract, different
wire.
"""

import datetime
import os
import re
import tomllib

import pytest

REF = "/root/reference/tests"
SCENARIOS = ["plain", "plain-nodaily", "tls"]


def _load(scen):
    with open(os.path.join(REF, scen, "test.toml"), "rb") as fh:
        return tomllib.load(fh)["test"]


def _fmt(v):
    """One value as ClickHouse's default (TSV) text format renders it:
    floats shortest-round-trip with integral values printed bare,
    arrays as ['a','b'], dates ISO."""
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join("'" + str(x) + "'" for x in v) + "]"
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    """Each scenario's input lines ingested through the full pipeline
    and stored — one root per scenario, view-registered lazily by the
    test body."""
    from carbon_clickhouse_spark.pipeline import (
        IngestConfig,
        derive_tables,
        write_tables,
    )
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    out = {}
    for scen in SCENARIOS:
        t = _load(scen)
        lines = spark.createDataFrame([(l,) for l in t["input"]], ["line"])
        points = parse_plain_lines(lines, now=1625478400)
        # honor the scenario's own deployment config (both the
        # nodaily and tls suites set disable-daily-index = true)
        with open(
            os.path.join(REF, scen, t.get("config_template",
                                          "carbon-clickhouse.conf.tpl"))
        ) as fh:
            tpl = fh.read()
        cfg = IngestConfig(
            now=1625478400,
            disable_daily_index=bool(
                re.search(r"disable-daily-index\s*=\s*true", tpl)
            ),
        )
        root = str(tmp_path_factory.mktemp(scen.replace("-", "_")))
        write_tables(derive_tables(points, cfg), root)
        out[scen] = root
    return out


def _cases():
    return [
        pytest.param(scen, i, v, id=f"{scen}-verify{i}")
        for scen in SCENARIOS
        for i, v in enumerate(_load(scen)["verify"])
    ]


@pytest.mark.parametrize("scen,i,verify", _cases())
def test_reference_verify_block(spark, roots, scen, i, verify):
    from carbon_clickhouse_spark.pipeline import register_clickhouse_views

    suffix = "_" + scen.replace("-", "_")
    register_clickhouse_views(
        spark,
        roots[scen],
        suffix=suffix,
        names={"graphite_tagged": "graphite_tags"},
    )
    q = verify["query"].replace("arraySort", "array_sort")
    q = re.sub(r"\bFROM (graphite\w*)", rf"FROM \1{suffix}", q)
    rows = spark.sql(q).collect()
    got = [" ".join(_fmt(v) for v in r) for r in rows]
    assert got == list(verify["output"]), (scen, verify["query"])
