"""In-process ClickHouse HTTP endpoint simulator (test double).

The reference proves its upload path against a Dockerized ClickHouse
(``cmd/e2e-test/e2etesting.go:113-155``); this environment has no
Docker, so this module provides the closest honest substitute: a real
HTTP server speaking ClickHouse's INSERT dialect — ``POST
?query=INSERT INTO <table> (...) FORMAT RowBinary`` with optional
``Content-Encoding: gzip`` — that STRICTLY decodes every RowBinary
body with an independent validating decoder (any trailing/truncated
byte is a hard 500, not a silent partial) and stores the rows for
golden assertions. Error injection drives the sink's retry ladder
over a real socket. It is NOT ClickHouse: no SQL SELECT engine, no
merges — verification reads ``sim.rows(table)`` directly.

Wire-format references: ``uploader/base.go:242-283`` (URL + headers),
``helper/RowBinary/write_buffer.go:170-176`` (points row),
``uploader/index.go:91-100`` / ``uploader/tagged.go:172-179``
(index/tagged rows).
"""

from __future__ import annotations

import gzip
import re
import struct
import threading
import urllib.parse
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_INSERT_RE = re.compile(
    r"^INSERT\s+INTO\s+(\S+?)(?:\s*\(([^)]*)\))?\s+FORMAT\s+RowBinary$",
    re.IGNORECASE,
)

# table name -> row kind; mirrors the reference's uploader `type`
# registry (uploader/uploader.go:47-64)
DEFAULT_KINDS = {
    "graphite": "points",
    "graphite_reverse": "points",
    "graphite_index": "index",
    "graphite_tagged": "tagged",
}


class _Reader:
    def __init__(self, data: bytes):
        self.data, self.i = data, 0

    def uvarint(self) -> int:
        n = shift = 0
        while True:
            if self.i >= len(self.data):
                raise ValueError("truncated uvarint")
            c = self.data[self.i]
            self.i += 1
            n |= (c & 0x7F) << shift
            if not c & 0x80:
                return n
            shift += 7
            if shift > 63:
                raise ValueError("uvarint overflow")

    def string(self) -> str:
        ln = self.uvarint()
        if self.i + ln > len(self.data):
            raise ValueError("truncated string")
        s = self.data[self.i : self.i + ln].decode("utf-8")
        self.i += ln
        return s

    def unpack(self, fmt: str):
        size = struct.calcsize(fmt)
        if self.i + size > len(self.data):
            raise ValueError("truncated fixed field")
        vals = struct.unpack_from(fmt, self.data, self.i)
        self.i += size
        return vals

    @property
    def eof(self) -> bool:
        return self.i >= len(self.data)


def decode_rows(data: bytes, kind: str) -> list[tuple]:
    """Strict full-body decode; raises ValueError on any corruption
    (unlike ``rowbinary.decode_points``'s salvage semantics — an
    INSERT body must be perfect, a chunk file may be torn)."""
    r = _Reader(data)
    out: list[tuple] = []
    while not r.eof:
        if kind == "points":
            path = r.string()
            value, time_, days, version = r.unpack("<dIHI")
            if days != time_ // 86400:
                raise ValueError(f"date/time mismatch for {path!r}")
            out.append((path, value, time_, days, version))
        elif kind == "index":
            days, level = r.unpack("<HI")
            path = r.string()
            (version,) = r.unpack("<I")
            out.append((days, level, path, version))
        elif kind == "tagged":
            (days,) = r.unpack("<H")
            tag1 = r.string()
            path = r.string()
            tags = [r.string() for _ in range(r.uvarint())]
            (version,) = r.unpack("<I")
            out.append((days, tag1, path, tags, version))
        else:
            raise ValueError(f"unknown row kind {kind!r}")
    return out


class ClickHouseSim:
    """Start with ``url = sim.start()``; point the sink at ``url``;
    assert on ``sim.rows(table)``; ``sim.stop()``.

    ``fail_next(n)`` makes the next ``n`` requests fail (HTTP 500 +
    ``X-ClickHouse-Exception-Code``), exercising the retry ladder
    through a real connection rather than an injected transport.
    """

    def __init__(self, kinds: dict[str, str] | None = None):
        self.kinds = dict(DEFAULT_KINDS, **(kinds or {}))
        self._rows: dict[str, list[tuple]] = defaultdict(list)
        self._lock = threading.Lock()
        self._fail_budget = 0
        self._fail_code = "252"
        self.requests: list[dict] = []
        self._srv: ThreadingHTTPServer | None = None

    # -- assertions ---------------------------------------------------
    def rows(self, table: str) -> list[tuple]:
        with self._lock:
            return list(self._rows[table])

    def fail_next(self, n: int, code: str = "252") -> None:
        with self._lock:
            self._fail_budget = n
            self._fail_code = code

    # -- lifecycle ----------------------------------------------------
    def start(self, ssl_context=None) -> str:
        """Plain HTTP by default; pass a server-side ``ssl.SSLContext``
        to serve the reference's TLS scenario (``tests/tls/``) — each
        request then records the negotiated ``tls_version`` /
        ``tls_cipher`` and the verified client cert subject
        (``tls_peer``), so mTLS and version/cipher constraints are
        assertable from the outside."""
        sim = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802
                pass

            def do_POST(self):  # noqa: N802
                try:
                    status, code, err = sim._handle(self)
                except Exception as e:  # decoder bug = loud 500
                    status, code, err = 500, "1000", str(e)
                self.send_response(status)
                self.send_header("X-ClickHouse-Exception-Code", code)
                self.end_headers()
                if err:
                    self.wfile.write(err.encode())

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        scheme = "http"
        if ssl_context is not None:
            self._srv.socket = ssl_context.wrap_socket(
                self._srv.socket, server_side=True
            )
            scheme = "https"
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return f"{scheme}://127.0.0.1:{self._srv.socket.getsockname()[1]}"

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None

    # -- request handling ---------------------------------------------
    def _handle(self, h: BaseHTTPRequestHandler) -> tuple[int, str, str]:
        split = urllib.parse.urlsplit(h.path)
        query = urllib.parse.parse_qs(split.query).get("query", [""])[0]
        ln = int(h.headers.get("Content-Length", 0))
        body = h.rfile.read(ln)
        with self._lock:
            inject = self._fail_budget > 0
            if inject:
                self._fail_budget -= 1
        req = {"query": query, "headers": dict(h.headers), "n_bytes": len(body)}
        conn = h.connection
        if hasattr(conn, "version"):  # TLS-wrapped socket
            req["tls_version"] = conn.version()
            req["tls_cipher"] = (conn.cipher() or (None,))[0]
            peer = conn.getpeercert()
            req["tls_peer"] = peer.get("subject") if peer else None
        self.requests.append(req)
        if inject:
            return 500, self._fail_code, "injected failure"
        m = _INSERT_RE.match(query.strip())
        if not m:
            return 400, "62", f"cannot parse query: {query!r}"
        table = m.group(1)
        kind = self.kinds.get(table)
        if kind is None:
            return 404, "60", f"unknown table {table!r}"
        if h.headers.get("Content-Encoding") == "gzip":
            try:
                body = gzip.decompress(body)
            except OSError as e:
                return 400, "33", f"bad gzip body: {e}"
        try:
            rows = decode_rows(body, kind)
        except ValueError as e:
            return 500, "33", f"corrupt RowBinary: {e}"
        with self._lock:
            self._rows[table].extend(rows)
        return 200, "0", ""
