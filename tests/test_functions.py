"""Pure-Python parity tests against the reference's unit-test vectors.

Vector sources: helper/tags/graphite_test.go:16-32,
receiver/plain_test.go:112-132, helper/escape/unescape_test.go,
helper/tags/graphite_template_test.go.
"""

import pytest

from carbon_clickhouse_spark.functions.escape import (
    escape_path,
    escape_query,
    unescape,
)
from carbon_clickhouse_spark.functions.tags import (
    TagConfig,
    graphite_canonicalize,
    parse_canonical_tags,
    prometheus_canonicalize,
    telegraf_metric_path,
)

# helper/tags/graphite_test.go:16-32 (err cases -> None)
GRAPHITE_VECTORS = [
    (";tag1=value2;tag2=value.2;tag1=value3", None),
    ("used;metric_type=gauge;agentdiamond;processed_by=statsd2", None),
    ("notag", "notag"),
    ("some.metric;tag1=value2;tag2=value.2;tag1=value3", "some.metric?tag1=value3&tag2=value.2"),
    ("some.metric;tag1=value2;tag2=value.2;tag1=value0", "some.metric?tag1=value0&tag2=value.2"),
    ("some.metric;c=1;b=2;a=3", "some.metric?a=3&b=2&c=1"),
    ("some.metric;k=a;k=_;k2=3;k=0;k=42", "some.metric?k=42&k2=3"),
    ("some.metric", "some.metric"),
    (
        "complex.delete_me.tag2./some/url/fff.series;tag2=value2",
        "complex.delete_me.tag2./some/url/fff.series?tag2=value2",
    ),
    ("name.иван", "name.иван"),
    ("name.иван;tagged=true", "name.%D0%B8%D0%B2%D0%B0%D0%BD?tagged=true"),
    ("some.metric,1", "some.metric,1"),
    ("some.metric,1;tagged=true", "some.metric,1?tagged=true"),
    ("some.metric?name", "some.metric?name"),
    ("some.metric?name;tagged=true", "some.metric%3Fname?tagged=true"),
    ("some.metric;tagged=true?false", "some.metric?tagged=true%3Ffalse"),
]


@pytest.mark.parametrize("inp,expected", GRAPHITE_VECTORS)
def test_graphite_canonicalize(inp, expected):
    assert graphite_canonicalize(inp) == expected


def test_spec_symbols_escaping():
    # tests/plain/test.toml:158-175 golden path
    inp = "spec_symbols;minus=-;plus=+;percent=%;underscore=_;colon=:;hash=#;forward/0=/0"
    assert (
        graphite_canonicalize(inp)
        == "spec_symbols?colon=%3A&forward%2F0=%2F0&hash=%23&minus=-&percent=%25&plus=%2B&underscore=_"
    )


def test_escape_rules():
    # path mode leaves Go's reserved-set unescaped except '?'
    assert escape_path("a/b:c;d,e=f&g+h") == "a/b:c;d,e=f&g+h"
    assert escape_path("a?b") == "a%3Fb"
    assert escape_path("a b") == "a%20b"
    # query mode escapes everything but unreserved; space -> '+'
    assert escape_query("a b") == "a+b"
    assert escape_query("a/b") == "a%2Fb"
    assert escape_query("-._~") == "-._~"
    assert escape_query(":") == "%3A"


def test_unescape_tolerant():
    assert unescape("a+b") == "a b"
    assert unescape("a%20b") == "a b"
    assert unescape("a%2zb") == "a%2zb"  # invalid escape passes through
    assert unescape("a%2") == "a%2"  # truncated
    assert unescape("%D0%B8%D0%B2%D0%B0%D0%BD") == "иван"
    assert unescape("plain") == "plain"


def test_unescape_non_utf8_round_trip():
    """%-escapes of bytes that are not valid UTF-8 (e.g. %FF) keep the
    raw byte like Go strings do: escape(unescape(x)) == x via
    surrogateescape."""
    s = unescape("%FF")
    assert escape_query(s) == "%FF"
    assert escape_path(s) == "%FF"
    mixed = unescape("a%FFb%20c")
    assert escape_path(mixed) == "a%FFb%20c"
    assert escape_query(mixed) == "a%FFb+c"
    # invalid multi-byte continuation also survives
    assert escape_query(unescape("%C3%28")) == "%C3%28"


def test_parse_canonical_tags():
    name, tags = parse_canonical_tags("cpu.loadavg?env=test&host=host1")
    assert name == "cpu.loadavg"
    assert tags == ["__name__=cpu.loadavg", "env=test", "host=host1"]
    # escaped values unescape (tests/plain/test.toml:159-175)
    name, tags = parse_canonical_tags(
        "spec_symbols?colon=%3A&forward%2F0=%2F0&hash=%23&minus=-&percent=%25&plus=%2B&underscore=_"
    )
    assert name == "spec_symbols"
    assert tags == [
        "__name__=spec_symbols",
        "colon=:",
        "forward/0=/0",
        "hash=#",
        "minus=-",
        "percent=%",
        "plus=+",
        "underscore=_",
    ]
    assert parse_canonical_tags("plain.path") is None


def test_prometheus_canonicalize():
    # helper/tags/prometheus.go:20-52: __name__ first, rest sorted
    labels = [("job", "node"), ("__name__", "up"), ("instance", "a:9100")]
    assert prometheus_canonicalize(labels) == "up?instance=a%3A9100&job=node"
    assert prometheus_canonicalize([("job", "x")]) is None


def test_telegraf_metric_path():
    # receiver/telegraf_http_json.go:36-121: field appended unless
    # 'value'; keys sort BEFORE the name->_name rename (host < name)
    assert (
        telegraf_metric_path("cpu", "usage_idle", {"host": "h1", "name": "n"})
        == "cpu_usage_idle?host=h1&_name=n"
    )
    assert telegraf_metric_path("cpu", "value", {"host": "h1"}) == "cpu?host=h1"


def test_template_tagging():
    # helper/tags/graphite_template_test.go:8-27 — verbatim vectors
    cfg = TagConfig(
        enabled=True,
        separator="_",
        tags=["tag0=value0", "tag1=value1"],
        templates=[
            "*.app a.b.c.measurement",
            "stats.* .host.measurement* region=us-west,tag1=new-value1",
            "multi.tags.* ..a.measurement*    tag0=new-value0",
            ".measurement*",
        ],
    ).configure()
    vectors = [
        ("some.metric", "metric?tag0=value0&tag1=value1"),
        ("aval.bval.cval.app", "app?a=aval&b=bval&c=cval&tag0=value0&tag1=value1"),
        (
            "stats.local.a.b.c.d",
            "a_b_c_d?host=local&region=us-west&tag0=value0&tag1=new-value1",
        ),
        (
            "multi.tags.aval.m1.m2.m3",
            "m1_m2_m3?a=aval&tag0=new-value0&tag1=value1",
        ),
    ]
    for inp, expected in vectors:
        assert graphite_canonicalize(inp, cfg) == expected, inp


def test_template_no_match_keeps_name():
    """Pins a deliberate divergence from helper/tags/graphite.go: when
    template tagging is enabled and NO template matches, the reference
    sets the name to '' (point written under an empty path); we keep
    the original untagged name instead of losing the point."""
    cfg = TagConfig(
        enabled=True,
        templates=["stats.* .host.measurement*"],  # filter never matches below
    ).configure()
    assert graphite_canonicalize("untemplated_name", cfg) == "untemplated_name"
    # already-tagged names bypass templates entirely
    assert (
        graphite_canonicalize("m;env=prod", cfg) == "m?env=prod"
    )
