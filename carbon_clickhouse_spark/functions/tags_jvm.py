"""JVM-side (pure column expression) Graphite tag canonicalization.

Byte-parity port of P3 (``helper/tags/graphite.go:45-128``) built on
Spark's ``url_encode`` (java.net.URLEncoder), which matches Go's
QueryEscape except for two bytes: Java keeps ``*`` (Go emits %2A) and
escapes ``~`` as %7E (Go keeps it). Path-escape additionally leaves
Go's reserved set ``$&+,/:;=@`` (plus space -> %20, not +) unescaped.
Both deltas are fixed with literal replaces, so the whole
canonicalization — split, validate, last-wins dedup, sort, escape,
join — runs inside whole-stage codegen. No Python in the ingest hot
path; the pandas-UDF variant remains for template tagging (P4).

Parity is enforced by tests comparing against the pure-Python
reference implementation over the reference's own vectors plus a
byte-sweep fuzz corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# url_encode deltas vs Go QueryEscape
_QUERY_FIXES = [("%7E", "~"), ("*", "%2A")]
# additional unescapes for Go path-escape (reserved set + space form)
_PATH_FIXES = [
    ("+", "%20"),  # path mode: space is %20, never '+'
    ("%24", "$"),
    ("%26", "&"),
    ("%2B", "+"),
    ("%2C", ","),
    ("%2F", "/"),
    ("%3A", ":"),
    ("%3B", ";"),
    ("%3D", "="),
    ("%40", "@"),
    ("%7E", "~"),
    ("*", "%2A"),
]


def _chain_replace(col: Column, pairs) -> Column:
    for old, new in pairs:
        col = F.replace(col, F.lit(old), F.lit(new))
    return col


def query_escape(col: Column) -> Column:
    """Go url.QueryEscape as a column expression."""
    return _chain_replace(F.url_encode(col), _QUERY_FIXES)


def path_escape(col: Column) -> Column:
    """Go url.PathEscape (escape.Path) as a column expression."""
    return _chain_replace(F.url_encode(col), _PATH_FIXES)


def unescape_col(s: Column) -> Column:
    """Tolerant unescape as a column expression: ``url_decode`` when
    the string is fully valid, else ``+``->space only (invalid %-
    sequences left as-is). Matches the Python reference
    (``escape.unescape``) everywhere except strings mixing VALID and
    INVALID %-escapes — such paths only arise from corrupt input, and
    the reference stops parsing those records anyway
    (``uploader/tagged.go:104-106``)."""
    return F.coalesce(F.try_url_decode(s), F.replace(s, F.lit("+"), F.lit(" ")))


def parse_tags_col(path: Column) -> Column:
    """Canonical tagged path -> struct(name, tags) — JVM equivalent of
    ``udfs.parse_tags_udf`` (ref ``uploader/tagged.go:58-119``).

    tags = ['__name__=<unescaped name>'] + each unescaped 'k=v'.

    The reference scans: a tag runs to the first ``&`` AFTER the first
    ``=`` of the remainder, and parsing STOPS when no ``=`` remains —
    so ``a&b=2`` is ONE tag ``a&b=2`` and a trailing ``&junk`` is
    dropped. Reproduced as a linear fold: ``&``-segments without ``=``
    merge into the next tag (re-joined with ``&``); a trailing run
    without ``=`` stays pending and is discarded.
    """
    name = unescape_col(F.substring_index(path, "?", 1))
    args = F.substring(path, F.instr(path, "?") + 1, F.length(path))
    pairs = F.aggregate(
        F.split(args, "&"),
        F.struct(
            F.array().cast("array<string>").alias("tags"),
            F.lit(None).cast("string").alias("pending"),
        ),
        lambda acc, x: F.struct(
            F.when(
                F.instr(F.concat_ws("&", acc["pending"], x), "=") >= 1,
                F.concat(acc["tags"], F.array(F.concat_ws("&", acc["pending"], x))),
            )
            .otherwise(acc["tags"])
            .alias("tags"),
            F.when(
                F.instr(F.concat_ws("&", acc["pending"], x), "=") >= 1,
                F.lit(None).cast("string"),
            )
            .otherwise(F.concat_ws("&", acc["pending"], x))
            .alias("pending"),
        ),
        lambda acc: acc["tags"],
    )
    tags = F.concat(
        F.array(F.concat(F.lit("__name__="), name)),
        F.transform(pairs, unescape_col),
    )
    return F.struct(name.alias("name"), tags.alias("tags"))


def graphite_invalid_col(s: Column) -> Column:
    """True exactly when :func:`graphite_canonicalize_col` would
    return NULL (tagged name failing validation).

    Split out so callers can FILTER on this cheap predicate (split +
    exists, no URL escaping) and keep the expensive canonicalize
    expression referenced exactly once afterwards — a filter on the
    canonicalize output inlines the whole (interpreted, lambda-bearing)
    expression into every reference, tripling per-row work."""
    has_tags = s.contains(";")
    name = F.substring_index(s, ";", 1)
    all_segs = F.split(s, ";")
    segs = F.slice(all_segs, 2, F.size(all_segs))
    seg_bad = F.exists(segs, lambda x: (x == "") | (F.instr(x, "=") < 2))
    return has_tags & ((F.length(name) == 0) | seg_bad)


def graphite_canonicalize_col(s: Column) -> Column:
    """``name;k=v;...`` -> canonical ``escaped?k=v&...`` | passthrough
    for untagged | NULL on parse errors (caller drops).

    Mirrors ``tags.Graphite``: segments split on ``;``; a segment
    without ``=`` (or with an empty key) is an error; duplicate keys
    resolve to the LAST occurrence; keys sort ascending.
    """
    has_tags = s.contains(";")
    name = F.substring_index(s, ";", 1)
    all_segs = F.split(s, ";")
    # tail of the split: slice length must stay clear of int overflow
    segs = F.slice(all_segs, 2, F.size(all_segs))

    # validity: name non-empty, no empty segment, '=' present past pos 1
    seg_bad = F.exists(
        segs, lambda x: (x == "") | (F.instr(x, "=") < 2)
    )
    invalid = (F.length(name) == 0) | seg_bad

    entries = F.transform(
        segs,
        lambda x: F.struct(
            F.substring_index(x, "=", 1).alias("k"),
            F.substring(x, F.instr(x, "=") + 1, F.length(x)).alias("v"),
        ),
    )
    # last-wins dedup as a linear fold: each entry evicts an earlier
    # one with the same key. (A positional filter + exists() over the
    # same array would inline `entries` quadratically into the plan,
    # blowing codegen into interpreted fallback.)
    deduped = F.aggregate(
        entries,
        F.array().cast("array<struct<k:string,v:string>>"),
        lambda acc, x: F.concat(
            F.filter(acc, lambda y: y["k"] != x["k"]), F.array(x)
        ),
    )
    sorted_entries = F.array_sort(deduped)
    joined = F.array_join(
        F.transform(
            sorted_entries,
            lambda x: F.concat(query_escape(x["k"]), F.lit("="), query_escape(x["v"])),
        ),
        "&",
    )
    canonical = F.concat(path_escape(name), F.lit("?"), joined)

    return F.when(~has_tags, s).when(invalid, F.lit(None)).otherwise(canonical)
