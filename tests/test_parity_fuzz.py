"""Property-based parity: JVM canonicalization == Python reference for
arbitrary generated inputs (hypothesis drives the corpus, one Spark
job evaluates the whole batch)."""

import string

from hypothesis import given, settings, strategies as st

from carbon_clickhouse_spark.functions.escape import (
    escape_path,
    escape_query,
    unescape,
)
from carbon_clickhouse_spark.functions.tags import graphite_canonicalize

NAME_CHARS = string.ascii_letters + string.digits + "._-/%+~* ?#:=иван名"
KV_CHARS = NAME_CHARS + "&"


@st.composite
def metric_line(draw):
    name = draw(st.text(NAME_CHARS, min_size=1, max_size=30))
    n_tags = draw(st.integers(0, 5))
    parts = [name]
    for _ in range(n_tags):
        k = draw(st.text(KV_CHARS, min_size=0, max_size=10))
        v = draw(st.text(KV_CHARS, min_size=0, max_size=10))
        parts.append(f"{k}={v}" if draw(st.booleans()) else k)
    return ";".join(parts)


class TestEscapeProperties:
    @given(st.text(NAME_CHARS, max_size=64))
    @settings(max_examples=300, deadline=None)
    def test_query_escape_roundtrip(self, s):
        # unescape(escape_query(x)) == x for all inputs
        assert unescape(escape_query(s)) == s

    @given(st.text(NAME_CHARS, max_size=64))
    @settings(max_examples=300, deadline=None)
    def test_path_escape_no_reserved_breakage(self, s):
        esc = escape_path(s)
        assert "?" not in esc  # the one reserved byte path-mode escapes
        for ch in esc:
            assert ch == "%" or ord(ch) < 128

    @given(st.lists(st.tuples(st.text(KV_CHARS.replace("=", ""), min_size=1, max_size=8),
                              st.text(KV_CHARS, max_size=8)), max_size=6),
           st.text(NAME_CHARS.replace(";", ""), min_size=1, max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_canonicalize_sorted_and_deduped(self, kvs, name):
        s = name + "".join(f";{k}={v}" for k, v in kvs)
        out = graphite_canonicalize(s)
        if out is None or "?" not in (out or ""):
            return
        # keys sort by their RAW (pre-escape) form (graphite.go:98)
        raw_keys = [
            unescape(p.split("=", 1)[0])
            for p in out.split("?", 1)[1].split("&")
            if p
        ]
        assert raw_keys == sorted(raw_keys)
        assert len(raw_keys) == len(set(raw_keys))


def test_jvm_python_parity_fuzz_batch(spark):
    """One Spark job over a seeded random corpus (deterministic)."""
    import random

    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.functions.tags_jvm import graphite_canonicalize_col

    rng = random.Random(42)

    def rand_text(chars, lo, hi):
        return "".join(rng.choice(chars) for _ in range(rng.randint(lo, hi)))

    corpus = []
    for _ in range(300):
        parts = [rand_text(NAME_CHARS, 1, 30)]
        for _ in range(rng.randint(0, 5)):
            k = rand_text(KV_CHARS, 0, 10)
            v = rand_text(KV_CHARS, 0, 10)
            parts.append(f"{k}={v}" if rng.random() < 0.8 else k)
        corpus.append(";".join(parts))
    corpus = list(dict.fromkeys(corpus))
    df = spark.createDataFrame([(s,) for s in corpus], ["s"])
    got = df.select("s", graphite_canonicalize_col(F.col("s")).alias("c")).collect()
    for r in got:
        assert r.c == graphite_canonicalize(r.s), f"input {r.s!r}"


def test_pipeline_never_crashes_on_arbitrary_lines(spark):
    """Robustness: a seeded corpus of adversarial protocol lines --
    control chars, unicode, binary-ish junk, huge tokens, NaN/inf,
    negative/overflow timestamps, deep tag nests -- goes through
    parse -> derive_tables end-to-end without raising, and every
    surviving row satisfies the points invariants."""
    import math
    import random

    from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines

    rng = random.Random(7)
    pools = [
        "abc.def-ghi_",
        "=;?&%+#/\\\t ",
        " \u00e9\u0438\u4e16",
        "0123456789.eE+-",
    ]

    def rand_token(lo=0, hi=40):
        pool = rng.choice(pools)
        return "".join(rng.choice(pool) for _ in range(rng.randint(lo, hi)))

    corpus = []
    for _ in range(500):
        shape = rng.random()
        if shape < 0.2:
            corpus.append(rand_token(0, 120))  # fieldless junk
        elif shape < 0.4:
            corpus.append(f"{rand_token(1)} {rand_token(0, 10)}")
        else:
            val = rng.choice(
                ["1.5", "NaN", "inf", "-inf", "1e308", "1e999", rand_token(0, 6), "-0"]
            )
            ts = rng.choice(
                ["1625478240", "-1", "0", "99999999999999999999", rand_token(0, 5)]
            )
            corpus.append(f"{rand_token(1)} {val} {ts}")
    corpus += [
        "a" * 100_000 + " 1 1625478240",              # drop_longer_than fodder
        "m;" + ";".join(f"k{i}=v{i}" for i in range(200)) + " 1 1625478240",
        " leading.space 1 1625478240",
        "trailing.space 1 1625478240 ",
        "tab\tseparated 1 1625478240",
    ]

    df = spark.createDataFrame([(l,) for l in corpus], ["value"])
    pts = parse_plain_lines(
        df, line_col="value", now=1625478400
    )
    tables = derive_tables(
        pts, IngestConfig(now=1625478400, drop_longer_than=4096)
    )
    rows = tables["points"].collect()
    for r in rows:
        assert r.path and len(r.path) <= 4096
        assert ";" not in r.path  # tagged paths normalized to '?'
        # reference parity: only NaN is dropped; +/-inf values pass
        # (receiver/plain.go:73-74 checks IsNaN only)
        assert r.value is not None and not math.isnan(r.value)
        assert r.time is not None  # huge/inf ts dropped, 0 passes (ref)
    # derived tables evaluate without raising too
    assert tables["index"].count() >= 0
    assert tables["tagged"].count() >= 0
