"""Parity: JVM-side canonicalization == pure-Python reference impl.

Covers the reference's own vectors plus a byte-sweep fuzz corpus
(every printable ASCII byte + UTF-8 multibyte in names, keys, values).
"""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.functions.escape import escape_path, escape_query
from carbon_clickhouse_spark.functions.tags import graphite_canonicalize
from carbon_clickhouse_spark.functions.tags_jvm import (
    graphite_canonicalize_col,
    path_escape,
    query_escape,
)
from tests.test_functions import GRAPHITE_VECTORS


def test_escape_parity_byte_sweep(spark):
    corpus = [chr(c) for c in range(0x20, 0x7F)] + [
        "иван", "名前", "a b", "100%", "a+b", "~tilde~", "*star*", "",
    ]
    df = spark.createDataFrame([(s,) for s in corpus], ["s"])
    got = df.select(
        "s",
        query_escape(F.col("s")).alias("q"),
        path_escape(F.col("s")).alias("p"),
    ).collect()
    for r in got:
        assert r.q == escape_query(r.s), f"query {r.s!r}"
        assert r.p == escape_path(r.s), f"path {r.s!r}"


def test_canonicalize_parity_reference_vectors(spark):
    inputs = [v[0] for v in GRAPHITE_VECTORS] + [
        "spec_symbols;minus=-;plus=+;percent=%;underscore=_;colon=:;hash=#;forward/0=/0",
        "non-ascii.иван;tagged=true",
        "m;a=1;a=2;a=3;b=x;a=4",
        "m;z=1;y=2;x=3",
        "m;k==v",   # value contains '='
        "m;k=v;",   # trailing empty segment -> error
        "m;=v",     # empty key -> error
        "plain.path.no.tags",
    ]
    df = spark.createDataFrame([(s,) for s in inputs], ["s"])
    got = df.select("s", graphite_canonicalize_col(F.col("s")).alias("c")).collect()
    for r in got:
        assert r.c == graphite_canonicalize(r.s), f"input {r.s!r}"


def test_parse_tags_parity_corrupt_paths(spark):
    """JVM parse_tags_col must agree with the Python scan parser
    (uploader/tagged.go semantics) on corrupt tagged paths: a tag runs
    to the first '&' after the first '=', parsing stops when no '='
    remains."""
    from carbon_clickhouse_spark.functions.tags import parse_canonical_tags
    from carbon_clickhouse_spark.functions.tags_jvm import parse_tags_col

    inputs = [
        "m?a=1&b=2",        # clean
        "m?a&b=2",          # '&' before '=': ONE tag 'a&b=2'
        "m?a=1&b",          # trailing corrupt segment: dropped
        "m?a=1&&b=2",       # empty segment merges: tag '&b=2'
        "m?a=1&b&c=3",      # mid corrupt segment merges into next tag
        "m?junk",           # no '=' at all: only __name__
        "m?",               # empty args
        "m?a=1&b&c&d",      # trailing corrupt run: all dropped
        "esc%20ape?k%201=v%26al&x=1",  # escapes still unescaped per-tag
    ]
    df = spark.createDataFrame([(s,) for s in inputs], ["s"])
    got = df.select("s", parse_tags_col(F.col("s")).alias("p")).collect()
    for r in got:
        name, tags = parse_canonical_tags(r.s)
        assert r.p.name == name, f"name {r.s!r}"
        assert list(r.p.tags) == tags, f"tags {r.s!r}: {list(r.p.tags)} != {tags}"


def test_canonicalize_parity_fuzz(spark):
    import itertools

    keys = ["a", "b2", "k.x", "k/x", "ключ", "k v", "k%v"]
    vals = ["1", "v.2", "v/2", "знач", "v v", "100%", "+", "~", "*"]
    inputs = []
    for i, (k, v) in enumerate(itertools.product(keys, vals)):
        k2, v2 = keys[(i + 3) % len(keys)], vals[(i + 5) % len(vals)]
        inputs.append(f"metric.name;{k}={v};{k2}={v2}")
    df = spark.createDataFrame([(s,) for s in inputs], ["s"])
    got = df.select("s", graphite_canonicalize_col(F.col("s")).alias("c")).collect()
    for r in got:
        assert r.c == graphite_canonicalize(r.s), f"input {r.s!r}"
