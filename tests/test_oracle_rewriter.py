"""The correctly-rounded-doubles oracle rewriter
(__spark_entry__._correctly_rounded_doubles) is mechanical surgery
over every oracle SQL string — pin its behavior directly, beyond the
end-to-end gates (which would catch semantic drift only as a
Spark-vs-oracle mismatch)."""

import struct

import duckdb
import pytest

import __spark_entry__ as entry


def rw(sql: str) -> str:
    return entry._correctly_rounded_doubles(sql)


def test_rewrites_aggregate_casts():
    assert (
        rw("SELECT CAST(sum(q) AS DOUBLE) AS s FROM t")
        == "SELECT CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS s FROM t"
    )
    assert (
        rw("CAST(count(*) AS DOUBLE)")
        == "CAST(CAST(count(*) AS VARCHAR) AS DOUBLE)"
    )
    # windowed sums too
    assert "CAST(CAST(sum(c) OVER (PARTITION BY g) AS VARCHAR) AS DOUBLE)" in rw(
        "SELECT CAST(sum(c) OVER (PARTITION BY g) AS DOUBLE) FROM t"
    )


def test_rewrites_only_sum_count_aliases():
    sql = (
        "WITH s AS (SELECT sum(q) AS sv, avg(x) AS av FROM t) "
        "SELECT CAST(sv AS DOUBLE), CAST(av AS DOUBLE), CAST(x AS DOUBLE) FROM s"
    )
    out = rw(sql)
    assert "CAST(CAST(sv AS VARCHAR) AS DOUBLE)" in out
    # avg returns double already; bare non-agg columns may be FLOAT —
    # a float32's shortest-roundtrip string parses to a DIFFERENT
    # double than exact widening, so neither may be rewritten
    assert "CAST(av AS DOUBLE)" in out
    assert "CAST(x AS DOUBLE)" in out
    assert "CAST(CAST(av" not in out
    assert "CAST(CAST(x" not in out


def test_leaves_other_casts_alone():
    for sql in (
        "CAST('nan' AS DOUBLE)",
        "CAST(sum(q) AS HUGEINT)",
        "CAST(x AS INT)",
        "CAST(-(CAST(c AS DOUBLE) / n) AS DECIMAL(28,12))",
        "list_transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))",
    ):
        assert rw(sql) == sql, sql


def test_nested_and_balanced():
    sql = "CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v"
    assert (
        rw(sql)
        == "CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS v"
    )
    # idempotent-ish: a second pass must not double-wrap (the inner
    # cast's target is VARCHAR, not DOUBLE)
    assert rw(rw(sql)) == rw(sql)


def test_every_oracle_still_parses():
    """All rewritten registry oracles must remain valid DuckDB SQL —
    parse-only via EXPLAIN against empty views."""
    con = duckdb.connect()
    for t, cols in {
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate DATE, l_commitdate DATE, l_receiptdate DATE, l_shipinstruct VARCHAR, l_shipmode VARCHAR, l_comment VARCHAR",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority VARCHAR, o_clerk VARCHAR, o_shippriority BIGINT, o_comment VARCHAR",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT, c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT, s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size BIGINT, p_container VARCHAR, p_retailprice DOUBLE, p_comment VARCHAR",
        "nation": "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR",
        "region": "r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR",
    }.items():
        defs = ", ".join(
            f"NULL::{c.split(' ', 1)[1]} AS {c.split(' ', 1)[0]}"
            for c in cols.split(", ")
        )
        con.execute(f"CREATE VIEW {t} AS SELECT {defs} WHERE 1=0")
    bad = []
    for name, sql in entry._all_oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_duckdb_misrounding_is_real_and_fixed():
    """The motivating case: DuckDB's native HUGEINT->DOUBLE cast is
    off by one ulp on 90106209094436838900; the VARCHAR route is
    IEEE-correct (matches Python's exact int->float)."""
    con = duckdb.connect()
    v = 90106209094436838900
    py = struct.pack(">d", float(v)).hex()
    direct = con.execute(
        f"SELECT CAST(CAST('{v}' AS HUGEINT) AS DOUBLE)"
    ).fetchone()[0]
    routed = con.execute(
        f"SELECT CAST(CAST(CAST('{v}' AS HUGEINT) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    if struct.pack(">d", direct).hex() == py:
        pytest.skip("this DuckDB build rounds the direct cast correctly")
    assert struct.pack(">d", routed).hex() == py


def test_skips_string_literals_and_comments():
    """r11 ADVICE: the lexical scan must never rewrite CAST( inside a
    quoted literal or a -- comment, literal parens must not skew the
    balance, and sum( inside a literal must not mint an alias."""
    # CAST( inside a string literal stays verbatim
    sql = "SELECT 'CAST(sum(q) AS DOUBLE)' AS lit, CAST(sum(q) AS DOUBLE) AS s FROM t"
    out = rw(sql)
    assert "'CAST(sum(q) AS DOUBLE)'" in out
    assert "CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS s" in out
    # CAST( inside a -- comment stays verbatim
    sql = "SELECT 1 -- CAST(sum(q) AS DOUBLE)\nFROM t"
    assert rw(sql) == sql
    # unbalanced paren inside a literal must not derail the scan
    sql = "SELECT ':-)' AS smile, CAST(count(*) AS DOUBLE) AS n FROM t"
    out = rw(sql)
    assert "CAST(CAST(count(*) AS VARCHAR) AS DOUBLE) AS n" in out
    assert "':-)'" in out
    # 'sum(' inside a literal must not register an agg alias: bare sv
    # here is NOT an aggregate alias, so its cast stays untouched
    sql = "SELECT 'sum(x) AS sv' AS doc, CAST(sv AS DOUBLE) FROM t"
    assert rw(sql) == sql
    # escaped quotes ('') inside literals keep the mask in phase
    sql = "SELECT 'it''s CAST(' AS a, CAST(sum(v) AS DOUBLE) AS s FROM t"
    out = rw(sql)
    assert "'it''s CAST('" in out
    assert "CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) AS s" in out


def test_mask_literals_helper():
    m = entry._mask_literals("a 'b''c' -- d\ne")
    assert len(m) == len("a 'b''c' -- d\ne")
    assert m[0] == "a"[0]
    assert "b" not in m and "c" not in m and "d" not in m
    assert m.endswith("e")
