"""RowBinary chunk-file reader/writer (K7 + §1.1 record format).

The reference's on-disk interchange format
(``helper/RowBinary/write_buffer.go:170-176``): per point

    uvarint(len(path)) + path | float64 LE value | uint32 LE time |
    uint16 LE date(days) | uint32 LE version

``read_rowbinary`` lets a migrating user ingest existing chunk files
directly; it applies the reference's corruption check — a record whose
date doesn't match days(time) terminates the scan of that file
(``helper/RowBinary/reader.go:149-151``), which is exactly the
``-recover`` salvage semantics (``carbon-clickhouse.go:52-95``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

_POINT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("time", T.LongType()),
        T.StructField("days", T.IntegerType()),
        T.StructField("version", T.LongType()),
    ]
)


def decode_points(data: bytes, utc_check: bool = True) -> list[tuple]:
    """Decode RowBinary graphite points; stops at the first corrupt
    record (reader.go:104-199 semantics)."""
    out = []
    i, n = 0, len(data)
    while i < n:
        # uvarint length
        ln = shift = 0
        start = i
        while True:
            if i >= n:
                return out
            c = data[i]
            ln |= (c & 0x7F) << shift
            i += 1
            if not c & 0x80:
                break
            shift += 7
        if ln == 0 or ln > 16384 or i + ln + 18 > n:
            return out
        try:
            path = data[i : i + ln].decode("utf-8")
        except UnicodeDecodeError:
            return out
        i += ln
        value, time_, days, version = struct.unpack("<dIHI", data[i : i + 18])
        i += 18
        if utc_check and days != time_ // 86400:
            # date/time mismatch = corruption marker; salvage stops here
            return out
        out.append((path, value, time_, days, version))
    return out


def encode_points(points: list[tuple]) -> bytes:
    """[(path, value, time, version)] -> RowBinary bytes (UTC dates)."""
    buf = bytearray()
    for path, value, time_, version in points:
        raw = path.encode("utf-8")
        ln = len(raw)
        while True:
            b = ln & 0x7F
            ln >>= 7
            buf.append(b | (0x80 if ln else 0))
            if not ln:
                break
        buf.extend(raw)
        buf.extend(struct.pack("<dIHI", value, time_, time_ // 86400, version))
    return bytes(buf)


def write_chunk(points: list[tuple], path: str, compress: str | None = None) -> str:
    """[(path, value, time, version)] -> one chunk file on disk.

    ``compress="lz4"`` emits an LZ4 frame and appends the ``.lz4``
    extension if missing — matching the reference writer's file naming
    (``writer/writer.go:201-205``) so the files interoperate with real
    carbon-clickhouse uploaders. Returns the final path."""
    data = encode_points(points)
    if compress == "lz4":
        from .lz4frame import compress_frame

        data = compress_frame(data)
        if not path.endswith(".lz4"):
            path += ".lz4"
    elif compress is not None:
        raise ValueError(f"unknown compression {compress!r} (none|lz4)")
    with open(path, "wb") as f:
        f.write(data)
    return path


def read_rowbinary(spark: SparkSession, path: str, utc_check: bool = True) -> DataFrame:
    """Chunk file(s) -> canonical points DataFrame. One file per task
    (chunk files are bounded by chunk-max-size, so this partitioning
    matches the writer's natural unit).

    ``.lz4`` chunks (the reference writer's compressed spool format,
    ``writer/writer.go:228-240``) are decompressed transparently,
    executor-side, keyed on the file extension exactly like the
    reference keys on ``lz4.Extension``.
    """
    blobs = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .lz4frame import decompress_frame

        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if str(fname).endswith(".lz4"):
                    try:
                        data = decompress_frame(data)
                    except ValueError:
                        # corrupt compressed chunk: salvage nothing from
                        # it, keep reading the others (recover semantics)
                        continue
                rows.extend(decode_points(data, utc_check))
            yield pd.DataFrame(
                rows, columns=["path", "value", "time", "days", "version"]
            )

    raw = blobs.mapInPandas(run, _POINT_SCHEMA)
    return raw.select(
        "path",
        "value",
        "time",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("days")).alias("date"),
        F.col("version").alias("version"),
    )


# ---------------------------------------------------------------------------
# index / tagged table row encodings (uploader/index.go, uploader/tagged.go)
# ---------------------------------------------------------------------------

def _put_uvarint(buf: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        buf.append(b | (0x80 if n else 0))
        if not n:
            return


def _put_string(buf: bytearray, s: str) -> None:
    raw = s.encode("utf-8")
    _put_uvarint(buf, len(raw))
    buf.extend(raw)


def encode_index_rows(rows: list[tuple]) -> bytes:
    """``[(days, level, path, version)]`` -> RowBinary for the
    ``graphite_index`` shape: uint16 Date, uint32 Level, String Path,
    uint32 Version — ``uploader/index.go:91-100`` (the level offsets
    for reverse/tree variants are already baked into ``level`` by the
    P11 operator, as in the reference)."""
    buf = bytearray()
    for days, level, path, version in rows:
        buf.extend(struct.pack("<HI", days, level))
        _put_string(buf, path)
        buf.extend(struct.pack("<I", version))
    return bytes(buf)


def encode_tagged_rows(rows: list[tuple]) -> bytes:
    """``[(days, tag1, path, tags, version)]`` -> RowBinary for the
    ``graphite_tagged`` shape: uint16 Date, String Tag1, String Path,
    Array(String) Tags (uvarint count + strings), uint32 Version —
    ``uploader/tagged.go:172-179``."""
    buf = bytearray()
    for days, tag1, path, tags, version in rows:
        buf.extend(struct.pack("<H", days))
        _put_string(buf, tag1)
        _put_string(buf, path)
        _put_uvarint(buf, len(tags))
        for t in tags:
            _put_string(buf, t)
        buf.extend(struct.pack("<I", version))
    return bytes(buf)
