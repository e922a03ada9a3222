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
