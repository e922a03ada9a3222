"""URL escaping with byte-exact parity to the reference's escape helpers.

The reference (go-graphite/carbon-clickhouse) escapes metric names with
Go's net/url path rules and tag keys/values with query rules
(``helper/escape/escape.go:6-21``, ``helper/escape/url.go:32-109``), and
unescapes with a tolerant decoder that passes invalid %-sequences through
verbatim and maps ``+`` to space (``helper/escape/unescape.go:34-98``).

These are pure-Python (bytes-level) reimplementations of that *behavior*:

- ``escape_path``: alnum, ``-_.~`` and ``$&+,/:;=@`` unescaped; ``?`` and
  everything else percent-encoded (uppercase hex), UTF-8 bytes.
- ``escape_query``: alnum and ``-_.~`` unescaped; space -> ``+``;
  everything else percent-encoded.
- ``unescape``: ``+`` -> space; ``%XX`` decoded only when followed by two
  hex digits, otherwise emitted literally (never raises).

Go strings are byte sequences; a valid %-escape whose bytes are not
valid UTF-8 (e.g. ``%FF``) stays raw in ``escape.Unescape``'s output
and re-escapes losslessly. Python strings round-trip the same way via
``surrogateescape``: unescape maps such bytes to lone surrogates and
the escape functions map those surrogates back to the original bytes.
(Lone surrogates cannot cross the Arrow boundary into Spark columns —
the UDF wrappers in ``functions.udfs`` sanitize at that edge.)
"""

from __future__ import annotations

_HEX = "0123456789ABCDEF"

_PATH_SAFE = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    b"-_.~$&+,/:;=@"
)
_QUERY_SAFE = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.~"
)

# Precomputed byte -> str translation tables (index by int byte value).
_PATH_TABLE = [
    chr(b) if b in _PATH_SAFE else "%" + _HEX[b >> 4] + _HEX[b & 15]
    for b in range(256)
]
_QUERY_TABLE = [
    chr(b) if b in _QUERY_SAFE else ("+" if b == 0x20 else "%" + _HEX[b >> 4] + _HEX[b & 15])
    for b in range(256)
]


def escape_path(s: str) -> str:
    """Escape a metric name as a URL path (ref ``escape.Path``)."""
    raw = s.encode("utf-8", "surrogateescape")
    if all(b in _PATH_SAFE for b in raw):
        return s
    t = _PATH_TABLE
    return "".join(t[b] for b in raw)


def escape_query(s: str) -> str:
    """Escape a tag key/value as a URL query component (ref ``escape.Query``)."""
    raw = s.encode("utf-8", "surrogateescape")
    if all(b in _QUERY_SAFE for b in raw):
        return s
    t = _QUERY_TABLE
    return "".join(t[b] for b in raw)


def _ishex(c: int) -> bool:
    return 0x30 <= c <= 0x39 or 0x61 <= c <= 0x66 or 0x41 <= c <= 0x46


def unescape(s: str) -> str:
    """Tolerant unescape (ref ``escape.Unescape``): never raises.

    ``+`` -> space; ``%XX`` decoded only for valid two-hex-digit
    sequences; malformed sequences pass through verbatim.
    """
    if "%" not in s and "+" not in s:
        return s
    raw = s.encode("utf-8", "surrogateescape")
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x25:  # '%'
            if i + 2 < n and _ishex(raw[i + 1]) and _ishex(raw[i + 2]):
                out.append(int(raw[i + 1 : i + 3].decode("ascii"), 16))
                i += 3
            elif n < i + 3:
                out.extend(raw[i:])
                break
            else:
                out.extend(raw[i : i + 3])
                i += 3
        elif c == 0x2B:  # '+'
            out.append(0x20)
            i += 1
        else:
            out.append(c)
            i += 1
    return out.decode("utf-8", errors="surrogateescape")
