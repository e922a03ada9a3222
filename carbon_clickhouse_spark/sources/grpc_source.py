"""gRPC carbon source (S4) — ``receiver/grpc.go`` / ``grpc/carbon.proto``.

Proto shape: ``Payload{ metrics: [Metric{ metric: string,
points: [Point{ timestamp: uint32, value: double }] }] }``. The Spark
engine ingests payloads either as already-structured rows (a thin gRPC
bridge writing to Kafka/files) or as raw protobuf blobs decoded with
the same varint walker used for Prometheus.

Semantics mirrored from ``doStore`` (:85-135): metric name <= 16384
bytes (:95), double-dot normalize + tag canonicalize per metric,
NaN values dropped; StoreSync's flush-before-ack maps onto
``foreachBatch`` commit semantics (K6).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from ..functions.dates import ts_to_date
from ..functions.tags import graphite_canonicalize
from .prometheus import _fields

MAX_NAME = 16384  # receiver/grpc.go:95

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField(
            "points",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("time", T.LongType()),
    ]
)


def parse_payload(body: bytes) -> list[tuple[str, list[tuple[int, float]]]]:
    """Payload protobuf -> [(metric, [(ts, value)])]."""
    out = []
    for f1, _, metric_bytes in _fields(body):
        if f1 != 1:
            continue
        name, points = "", []
        for f2, _, p2 in _fields(metric_bytes):
            if f2 == 1:
                name = p2.decode("utf-8")
            elif f2 == 2:
                ts, val = 0, 0.0
                for f3, wt3, p3 in _fields(p2):
                    if f3 == 1 and wt3 == 0:
                        ts = p3
                    elif f3 == 2 and wt3 == 1:
                        val = struct.unpack("<d", p3)[0]
                points.append((ts, val))
        out.append((name, points))
    return out


def grpc_payloads_to_points(
    blobs: DataFrame, blob_col: str = "content", version: Column | int = 0
) -> DataFrame:
    """Raw Payload protobuf blobs -> canonical points."""
    version_col = F.lit(version).cast("long") if isinstance(version, int) else version

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for name, points in parse_payload(bytes(blob)):
                    if not name or len(name.encode("utf-8")) > MAX_NAME:
                        continue
                    canonical = graphite_canonicalize(_normalize(name))
                    if not canonical:
                        continue
                    for ts, val in points:
                        if not 0 <= ts < (1 << 63):
                            continue  # varint past int64: drop, don't abort the batch
                        if math.isnan(val):
                            continue
                        rows.append((canonical, val, int(ts)))
            yield pd.DataFrame(rows, columns=["path", "value", "time"])

    raw = blobs.mapInPandas(run, _RAW_SCHEMA)
    return raw.select(
        "path", "value", "time", ts_to_date("time").alias("date"),
        version_col.alias("version"),
    )


def structured_payloads_to_points(
    metrics: DataFrame, version: Column | int = 0
) -> DataFrame:
    """PAYLOAD_SCHEMA rows (from a gRPC bridge) -> canonical points;
    the JVM does the explode, Python only canonicalizes names."""
    from ..functions.paths import normalize_double_dot
    from ..functions.udfs import graphite_canonicalize_udf

    version_col = F.lit(version).cast("long") if isinstance(version, int) else version
    return (
        metrics.filter(F.length("metric") <= MAX_NAME)
        .select(
            graphite_canonicalize_udf(
                normalize_double_dot(F.col("metric"))
            ).alias("path"),
            F.explode("points").alias("p"),
        )
        .filter(F.col("path").isNotNull() & (F.col("path") != ""))
        .select(
            "path",
            F.col("p.value").alias("value"),
            F.col("p.timestamp").alias("time"),
        )
        .filter(~F.isnan("value"))
        .select(
            "path", "value", "time", ts_to_date("time").alias("date"),
            version_col.alias("version"),
        )
    )


def _normalize(name: str) -> str:
    while ".." in name:
        name = name.replace("..", ".")
    return name
