"""Real-ClickHouse sink (K5) — ``uploader/base.go:242-283``.

For deployments keeping ClickHouse as the serving store, this sink
reproduces the reference's upload path from Spark: per partition,
encode rows as RowBinary and POST ``INSERT INTO <table> (<cols>)
FORMAT RowBinary`` (optionally gzip, ``uploader/base.go:216-240``) to
the CH HTTP endpoint, checking the ``X-ClickHouse-Exception-Code``
header. Transport is injectable so the encoding path is fully testable
offline (no ClickHouse in this environment).

Use from streaming as ``foreachBatch(lambda df, _: insert_points(df,
url, table))`` — the at-least-once retry + ReplacingMergeTree dedup
contract is identical to the reference's.
"""

from __future__ import annotations

import gzip as gzip_mod
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame

from ..sources.rowbinary import encode_points

POINTS_COLUMNS = "(Path, Value, Time, Date, Timestamp)"


def _default_transport(url: str, body: bytes, headers: dict[str, str]) -> tuple[int, dict]:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:  # noqa: S310
        return resp.status, dict(resp.headers)


def insert_query_url(base_url: str, table: str, columns: str = POINTS_COLUMNS) -> str:
    """Build the CH HTTP URL with the INSERT as the ``query`` param
    (the reference streams the body as pure RowBinary)."""
    q = f"INSERT INTO {table} {columns} FORMAT RowBinary"
    sep = "&" if "?" in base_url else "?"
    return f"{base_url}{sep}query={urllib.parse.quote(q)}"


def encode_partition(rows, zero_timestamp: bool = True) -> bytes:
    """points rows -> RowBinary body (P13 zero-timestamp honored)."""
    return encode_points(
        [
            (
                r["path"],
                float(r["value"]),
                int(r["time"]),
                0 if zero_timestamp else int(r["version"]),
            )
            for r in rows
        ]
    )


def insert_points(
    df: DataFrame,
    base_url: str,
    table: str,
    gzip: bool = True,
    transport: Callable | None = None,
    zero_timestamp: bool = True,
) -> None:
    """Upload a points DataFrame into ClickHouse, one POST per
    partition (the partition is the reference's chunk file)."""
    url = insert_query_url(base_url, table)
    send = transport or _default_transport

    def upload(rows) -> None:
        body = encode_partition(rows, zero_timestamp)
        if not body:
            return
        headers = {"Content-Type": "application/octet-stream"}
        if gzip:
            body = gzip_mod.compress(body, compresslevel=1)
            headers["Content-Encoding"] = "gzip"
        status, resp_headers = send(url, body, headers)
        exc = resp_headers.get("X-ClickHouse-Exception-Code")
        if status != 200 or (exc and exc != "0"):
            raise RuntimeError(
                f"clickhouse insert failed: status={status} exception={exc}"
            )

    df.select("path", "value", "time", "version").foreachPartition(upload)
