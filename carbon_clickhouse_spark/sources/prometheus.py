"""Prometheus remote-write source (S5) — ``receiver/prometheus.go``.

The reference receives snappy-compressed protobuf ``WriteRequest``
bodies over HTTP and walks them with a hand-rolled zero-alloc decoder
(``helper/pb/pb.go:20-118``). In Spark the HTTP front lands request
bodies in files/Kafka; decoding happens in two stages:

- ``decode_write_requests``: raw bodies -> rows of
  (labels array<struct<name,value>>, samples array<struct<value,
  timestamp_ms>>) via ``mapInPandas`` (python-snappy / protobuf are
  optional; a pure-Python varint walker mirroring the reference's
  ``helper/pb`` is built in, so no external deps are required)
- ``prometheus_series_to_points``: the struct rows -> canonical
  points: ``__name__`` hoisted, labels sorted, query-escaped
  (``helper/tags/prometheus.go:20-52``); ms -> s timestamps
  (``receiver/prometheus.go:105``); NaN samples dropped (:97-99).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from ..functions.dates import ts_to_date
from ..functions.udfs import prometheus_canonicalize_udf

SERIES_SCHEMA = T.StructType(
    [
        T.StructField(
            "labels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "samples",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("value", T.DoubleType()),
                        T.StructField("timestamp_ms", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


# --- minimal protobuf walker (behavioral mirror of helper/pb/pb.go) ---------

def _uvarint(b: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        c = b[i]
        result |= (c & 0x7F) << shift
        i += 1
        if not c & 0x80:
            return result, i
        shift += 7


def _fields(b: bytes):
    """Yield (field_no, wire_type, payload) triples."""
    i = 0
    n = len(b)
    while i < n:
        key, i = _uvarint(b, i)
        field, wt = key >> 3, key & 7
        if wt == 2:  # length-delimited
            ln, i = _uvarint(b, i)
            yield field, wt, b[i : i + ln]
            i += ln
        elif wt == 0:
            v, i = _uvarint(b, i)
            yield field, wt, v
        elif wt == 1:
            yield field, wt, b[i : i + 8]
            i += 8
        elif wt == 5:
            yield field, wt, b[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def parse_write_request(body: bytes) -> list[tuple[list, list]]:
    """WriteRequest bytes -> [(labels, samples)]; labels as (name,
    value) tuples, samples as (value, timestamp_ms)."""
    import struct

    out = []
    for field, _, ts_bytes in _fields(body):
        if field != 1:  # repeated TimeSeries timeseries = 1
            continue
        labels, samples = [], []
        for f2, _, payload in _fields(ts_bytes):
            if f2 == 1:  # Label
                name = value = ""
                for f3, _, p3 in _fields(payload):
                    if f3 == 1:
                        name = p3.decode("utf-8")
                    elif f3 == 2:
                        value = p3.decode("utf-8")
                labels.append((name, value))
            elif f2 == 2:  # Sample
                val, ts = 0.0, 0
                for f3, wt3, p3 in _fields(payload):
                    if f3 == 1 and wt3 == 1:
                        val = struct.unpack("<d", p3)[0]
                    elif f3 == 2:
                        ts = p3 if isinstance(p3, int) else 0
                if not 0 <= ts < (1 << 63):
                    continue  # varint past int64: drop, don't abort the batch
                samples.append((val, ts))
        out.append((labels, samples))
    return out


def decode_write_requests(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """(body binary) -> SERIES_SCHEMA rows. Bodies may be snappy-
    compressed (tried first when python-snappy is available)."""

    try:
        import snappy  # optional C implementation, preferred

        def _maybe_decompress(b: bytes) -> bytes:
            try:
                return snappy.uncompress(b)
            except Exception:
                return b

    except ImportError:
        from .snappy_block import SnappyError, decompress as _snappy

        def _maybe_decompress(b: bytes) -> bytes:
            # pure-Python snappy block decode; uncompressed bodies
            # (tests, debug clients) pass through on decode failure
            try:
                return _snappy(b)
            except SnappyError:
                return b

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[body_col]:
                for labels, samples in parse_write_request(_maybe_decompress(bytes(body))):
                    rows.append(
                        {
                            "labels": [
                                {"name": n, "value": v} for n, v in labels
                            ],
                            "samples": [
                                {"value": v, "timestamp_ms": t} for v, t in samples
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=["labels", "samples"])

    return bodies.mapInPandas(run, SERIES_SCHEMA)


def prometheus_series_to_points(
    series: DataFrame, version: Column | int = 0
) -> DataFrame:
    """SERIES_SCHEMA rows -> canonical points (drops NaN and
    missing-__name__ series, ms -> s)."""
    version_col = F.lit(version).cast("long") if isinstance(version, int) else version
    exploded = (
        series.withColumn(
            "path",
            # the UDF is marked non-deterministic at its DEFINITION
            # (functions/udfs.py, ADVICE r12 #1) so the isNotNull
            # filter below cannot duplicate it into two
            # ArrowEvalPython stages (optimization guide §4.4)
            prometheus_canonicalize_udf(F.col("labels")),
        )
        .filter(F.col("path").isNotNull())
        .select("path", F.explode("samples").alias("s"))
        .select(
            "path",
            F.col("s.value").alias("value"),
            F.expr("s.timestamp_ms div 1000").alias("time"),  # ms -> s (:105)
        )
        # NaN may surface as NULL after Arrow struct conversion; the
        # reference drops both (receiver/prometheus.go:97-99)
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
    )
    return exploded.select(
        "path",
        "value",
        "time",
        ts_to_date("time").alias("date"),
        version_col.alias("version"),
    )
