"""Additional reference unit-test vectors ported verbatim:
uploader/filter_test.go, helper/RowBinary/reverse_test.go,
helper/escape/unescape_test.go.
"""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.functions.escape import unescape
from carbon_clickhouse_spark.functions.paths import path_reverse
from carbon_clickhouse_spark.operators.filters import ignored_patterns_predicate

# helper/escape/unescape_test.go:11-44
UNESCAPE_VECTORS = [
    ("", ""),
    ("abc", "abc"),
    ("1%41", "1A"),
    ("1%41%42%43", "1ABC"),
    ("%4a", "J"),
    ("%6F", "o"),
    ("%", "%"),
    ("%a", "%a"),
    ("%1", "%1"),
    ("123%45%6", "123E%6"),
    ("%zzzzz", "%zzzzz"),
    ("a+b", "a b"),
    ("a+%3D+b", "a = b"),
]


@pytest.mark.parametrize("inp,want", UNESCAPE_VECTORS)
def test_unescape_reference_vectors(inp, want):
    assert unescape(inp) == want


def test_reverse_reference_vectors(spark):
    # helper/RowBinary/reverse_test.go:21-28 — segment reverse must
    # match bytes.Split/Join semantics incl. empty segments
    vectors = [
        (
            "carbon.agents.carbon-clickhouse.graphite1.tcp.metricsReceived",
            "metricsReceived.tcp.graphite1.carbon-clickhouse.agents.carbon",
        ),
        ("", ""),
        (".", "."),
        ("carbon..xx", "xx..carbon"),
        (".hello..world.", ".world..hello."),
    ]
    df = spark.createDataFrame([(v[0],) for v in vectors], ["p"])
    got = {r.p: r.r for r in df.select("p", path_reverse("p").alias("r")).collect()}
    for inp, want in vectors:
        assert got[inp] == want, inp


def _blacklist_keep(spark, patterns, names):
    df = spark.createDataFrame([(n,) for n in names], ["path"])
    keep = ignored_patterns_predicate(patterns)
    kept = {r.path for r in df.filter(keep).collect()}
    return {n: n in kept for n in names}


def test_blacklist_exact_reference_vectors(spark):
    # uploader/filter_test.go:9-39 (forward direction; the reverse
    # direction is served by filtering before path reversal)
    patterns = [
        "a.b.c.d.e",
        "a.b.c.d.f",
        "xxx.yyy.zz.tt",
        "1234.2345.3456.4567.5678.67890",
    ]
    kept = _blacklist_keep(
        spark,
        patterns,
        [
            "a.b.c.d.e",
            "a.b.c.d.f",
            "xxx.yyy.zz.tt",
            "1234.2345.3456.4567.5678.67890",
            "a.b.c.d",
            "a.a.a.a.a",
            "a.b.c.a.e",
            "a.b.c.d.g",
        ],
    )
    assert not kept["a.b.c.d.e"]
    assert not kept["a.b.c.d.f"]
    assert not kept["xxx.yyy.zz.tt"]
    assert not kept["1234.2345.3456.4567.5678.67890"]
    assert kept["a.b.c.d"]
    assert kept["a.a.a.a.a"]
    assert kept["a.b.c.a.e"]
    assert kept["a.b.c.d.g"]


def test_blacklist_wildcard_reference_vectors(spark):
    # uploader/filter_test.go:41-60: '*' never crosses a dot; patterns
    # implicitly segment-count-scoped
    patterns = ["*", "aa.*.bb", "aa.bb.*", "aa.*.bb.*.cc", "*.*.*.*"]
    kept = _blacklist_keep(
        spark,
        patterns,
        [
            "xyz",
            "aa.bb.cc",
            "aa.cc.bb",
            "aa.xyz.bb.hhh.cc",
            "1.2.3.4",
            "aa.bb",  # 2 segments: no 2-segment pattern
            "x.y",
        ],
    )
    assert not kept["xyz"]
    assert not kept["aa.bb.cc"]
    assert not kept["aa.cc.bb"]
    assert not kept["aa.xyz.bb.hhh.cc"]
    assert not kept["1.2.3.4"]
    assert kept["aa.bb"]
    assert kept["x.y"]
