"""OTLP metrics source — a modern front beyond the reference's six.

Decodes OpenTelemetry ``ExportMetricsServiceRequest`` protobuf bodies
(opentelemetry/proto/metrics/v1/metrics.proto, public spec) with the
same pure-Python varint walker style as ``sources/prometheus.py`` (no
otel SDK, no generated stubs) into the Prometheus ``SERIES_SCHEMA``
rows — so canonicalization, NaN handling, ms->s conversion, and the
whole four-table pipeline downstream are SHARED with the Prometheus
path (``prometheus_series_to_points``), not re-implemented.

Mapping (Prometheus exposition conventions):
- gauge / sum number points -> one series per point-attribute set;
  ``__name__`` = metric name, resource + point attributes as labels
  (point wins on key collision)
- histogram -> ``<name>_bucket`` per cumulative ``le`` bound (+Inf
  last), ``<name>_count``, ``<name>_sum``
- summary -> ``<name>`` per ``quantile`` label, ``<name>_count``,
  ``<name>_sum``
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame

from .prometheus import (
    SERIES_SCHEMA,
    _fields,
    prometheus_series_to_points,
)


def _any_value(payload: bytes) -> str:
    """AnyValue -> label string (string/bool/int/double arms)."""
    for f, wt, p in _fields(payload):
        if f == 1:  # string_value
            return p.decode("utf-8", errors="replace")
        if f == 2:  # bool_value
            return "true" if p else "false"
        if f == 3:  # int_value (varint)
            return str(p)
        if f == 4 and wt == 1:  # double_value
            v = struct.unpack("<d", p)[0]
            if math.isinf(v) or math.isnan(v):
                return repr(v)  # int(v) would raise on inf/nan
            return repr(v) if v != int(v) else str(int(v))
    return ""


def _attributes(payload: bytes) -> list[tuple[str, str]]:
    """One KeyValue message -> [(key, value_str)]."""
    key, val = "", ""
    for f, _, p in _fields(payload):
        if f == 1:
            key = p.decode("utf-8", errors="replace")
        elif f == 2:
            val = _any_value(p)
    return [(key, val)]


def _packed_fixed64(payload) -> list[int]:
    if isinstance(payload, int):  # unpacked single varint form
        return [payload]
    # a truncated body may end mid-element; decode whole 8-byte chunks
    # only instead of letting struct.error abort the micro-batch
    return [
        struct.unpack_from("<Q", payload, i)[0]
        for i in range(0, len(payload) - 7, 8)
    ]


def _packed_double(payload: bytes) -> list[float]:
    return [
        struct.unpack_from("<d", payload, i)[0]
        for i in range(0, len(payload) - 7, 8)
    ]


def _number_point(payload: bytes) -> tuple[list, float | None, int]:
    """NumberDataPoint -> (attrs, value, time_ms)."""
    attrs: list[tuple[str, str]] = []
    value: float | None = None
    t_ms = 0
    for f, wt, p in _fields(payload):
        if f == 7 and wt == 2:  # attributes
            attrs += _attributes(p)
        elif f == 3 and wt == 1:  # time_unix_nano (fixed64)
            t_ms = struct.unpack("<Q", p)[0] // 1_000_000
        elif f == 4 and wt == 1:  # as_double
            value = struct.unpack("<d", p)[0]
        elif f == 6 and wt == 1:  # as_int (sfixed64)
            value = float(struct.unpack("<q", p)[0])
    return attrs, value, t_ms


def _histogram_point(payload: bytes):
    attrs: list[tuple[str, str]] = []
    t_ms = count = 0
    total: float | None = None
    bucket_counts: list[int] = []
    bounds: list[float] = []
    for f, wt, p in _fields(payload):
        if f == 9 and wt == 2:
            attrs += _attributes(p)
        elif f == 3 and wt == 1:
            t_ms = struct.unpack("<Q", p)[0] // 1_000_000
        elif f == 4 and wt == 1:
            count = struct.unpack("<Q", p)[0]
        elif f == 5 and wt == 1:
            total = struct.unpack("<d", p)[0]
        elif f == 6:
            bucket_counts += _packed_fixed64(p)
        elif f == 7 and wt == 2:
            bounds += _packed_double(p)
    return attrs, t_ms, count, total, bucket_counts, bounds


def _packed_uvarint(payload) -> list[int]:
    """Packed repeated uint64 (varint) — ExponentialHistogram bucket
    counts use this, unlike classic histograms' fixed64."""
    if isinstance(payload, int):  # unpacked single varint form
        return [payload]
    out, i, n = [], 0, len(payload)
    val = shift = 0
    while i < n:
        b = payload[i]
        val |= (b & 0x7F) << shift
        shift += 7
        i += 1
        if not b & 0x80:
            out.append(val)
            val = shift = 0
    return out


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _exp_buckets(payload: bytes) -> tuple[int, list[int]]:
    """ExponentialHistogramDataPoint.Buckets -> (offset, counts)."""
    offset, counts = 0, []
    for f, wt, p in _fields(payload):
        if f == 1 and wt == 0:  # sint32 offset (zigzag)
            offset = _zigzag(p)
        elif f == 2:
            counts += _packed_uvarint(p)
    return offset, counts


def _exp_histogram_point(payload: bytes):
    """ExponentialHistogramDataPoint -> (attrs, t_ms, count, sum,
    scale, zero_count, (pos_offset, pos_counts))."""
    attrs: list[tuple[str, str]] = []
    t_ms = count = zero_count = 0
    total: float | None = None
    scale = 0
    pos = (0, [])
    for f, wt, p in _fields(payload):
        if f == 1 and wt == 2:
            attrs += _attributes(p)
        elif f == 3 and wt == 1:
            t_ms = struct.unpack("<Q", p)[0] // 1_000_000
        elif f == 4 and wt == 1:
            count = struct.unpack("<Q", p)[0]
        elif f == 5 and wt == 1:
            total = struct.unpack("<d", p)[0]
        elif f == 6 and wt == 0:
            scale = _zigzag(p)
        elif f == 7 and wt == 1:
            zero_count = struct.unpack("<Q", p)[0]
        elif f == 8 and wt == 2:
            pos = _exp_buckets(p)
    return attrs, t_ms, count, total, scale, zero_count, pos


def _summary_point(payload: bytes):
    attrs: list[tuple[str, str]] = []
    t_ms = count = 0
    total: float | None = None
    quantiles: list[tuple[float, float]] = []
    for f, wt, p in _fields(payload):
        if f == 7 and wt == 2:
            attrs += _attributes(p)
        elif f == 3 and wt == 1:
            t_ms = struct.unpack("<Q", p)[0] // 1_000_000
        elif f == 4 and wt == 1:
            count = struct.unpack("<Q", p)[0]
        elif f == 5 and wt == 1:
            total = struct.unpack("<d", p)[0]
        elif f == 6 and wt == 2:  # ValueAtQuantile
            q = v = 0.0
            for f2, wt2, p2 in _fields(p):
                if f2 == 1 and wt2 == 1:
                    q = struct.unpack("<d", p2)[0]
                elif f2 == 2 and wt2 == 1:
                    v = struct.unpack("<d", p2)[0]
            quantiles.append((q, v))
    return attrs, t_ms, count, total, quantiles


def _fmt_bound(b: float) -> str:
    if math.isinf(b) or math.isnan(b):
        return repr(b)  # adversarial inf/nan bound: int(b) would raise
    return repr(b) if b != int(b) else str(int(b))


def parse_export_metrics(body: bytes) -> list[tuple[list, list]]:
    """ExportMetricsServiceRequest bytes -> [(labels, samples)] in the
    Prometheus SERIES_SCHEMA shape: labels as (name, value) with
    ``__name__`` first, samples as (value, timestamp_ms)."""
    out: list[tuple[list, list]] = []

    def emit(name: str, res_attrs, pt_attrs, extra, value, t_ms):
        if value is None:
            return
        merged = dict(res_attrs)
        merged.update(dict(pt_attrs))
        merged.update(dict(extra))
        labels = [("__name__", name)] + sorted(merged.items())
        out.append((labels, [(value, t_ms)]))

    for f, _, rm in _fields(body):
        if f != 1:  # repeated ResourceMetrics resource_metrics = 1
            continue
        res_attrs: list[tuple[str, str]] = []
        scope_metrics = []
        for f2, _, p2 in _fields(rm):
            if f2 == 1:  # Resource
                for f3, wt3, p3 in _fields(p2):
                    if f3 == 1 and wt3 == 2:
                        res_attrs += _attributes(p3)
            elif f2 == 2:  # ScopeMetrics
                scope_metrics.append(p2)
        for sm in scope_metrics:
            for f2, _, metric in _fields(sm):
                if f2 != 2:  # repeated Metric metrics = 2
                    continue
                name = ""
                for f3, wt3, p3 in _fields(metric):
                    if f3 == 1 and wt3 == 2:
                        name = p3.decode("utf-8", errors="replace")
                for f3, wt3, p3 in _fields(metric):
                    if f3 in (5, 7) and wt3 == 2:  # Gauge / Sum
                        for f4, _, dp in _fields(p3):
                            if f4 != 1:
                                continue
                            attrs, value, t_ms = _number_point(dp)
                            emit(name, res_attrs, attrs, [], value, t_ms)
                    elif f3 == 9 and wt3 == 2:  # Histogram
                        for f4, _, dp in _fields(p3):
                            if f4 != 1:
                                continue
                            (attrs, t_ms, count, total,
                             bucket_counts, bounds) = _histogram_point(dp)
                            cum = 0
                            for i, bc in enumerate(bucket_counts):
                                cum += bc
                                le = (
                                    _fmt_bound(bounds[i])
                                    if i < len(bounds)
                                    else "+Inf"
                                )
                                emit(
                                    f"{name}_bucket", res_attrs, attrs,
                                    [("le", le)], float(cum), t_ms,
                                )
                            emit(f"{name}_count", res_attrs, attrs, [],
                                 float(count), t_ms)
                            if total is not None:
                                emit(f"{name}_sum", res_attrs, attrs, [],
                                     total, t_ms)
                    elif f3 == 10 and wt3 == 2:  # ExponentialHistogram
                        # downgrade to classic cumulative le buckets:
                        # base = 2^(2^-scale); positive bucket i (with
                        # offset o) has upper bound base^(o+i+1); the
                        # zero bucket seeds the cumulative count, and
                        # negative buckets land only in count/+Inf
                        # (graphite consumers have no negative-bound
                        # le convention)
                        for f4, _, dp in _fields(p3):
                            if f4 != 1:
                                continue
                            (attrs, t_ms, count, total, scale,
                             zero_count, (off, counts)) = (
                                _exp_histogram_point(dp)
                            )
                            base = 2.0 ** (2.0 ** -scale)
                            cum = zero_count
                            for i, bc in enumerate(counts):
                                cum += bc
                                le = _fmt_bound(base ** (off + i + 1))
                                emit(
                                    f"{name}_bucket", res_attrs, attrs,
                                    [("le", le)], float(cum), t_ms,
                                )
                            emit(
                                f"{name}_bucket", res_attrs, attrs,
                                [("le", "+Inf")], float(count), t_ms,
                            )
                            emit(f"{name}_count", res_attrs, attrs, [],
                                 float(count), t_ms)
                            if total is not None:
                                emit(f"{name}_sum", res_attrs, attrs, [],
                                     total, t_ms)
                    elif f3 == 11 and wt3 == 2:  # Summary
                        for f4, _, dp in _fields(p3):
                            if f4 != 1:
                                continue
                            attrs, t_ms, count, total, quantiles = (
                                _summary_point(dp)
                            )
                            for q, v in quantiles:
                                emit(
                                    name, res_attrs, attrs,
                                    [("quantile", _fmt_bound(q))], v, t_ms,
                                )
                            emit(f"{name}_count", res_attrs, attrs, [],
                                 float(count), t_ms)
                            if total is not None:
                                emit(f"{name}_sum", res_attrs, attrs, [],
                                     total, t_ms)
    return out


def decode_otlp_requests(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """(body binary) -> SERIES_SCHEMA rows, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[body_col]:
                # drop rows, not batches: a malformed body already
                # landed on disk would otherwise crash-loop the
                # streaming query through Spark's replay — one
                # adversarial POST must never wedge the front
                try:
                    series = parse_export_metrics(bytes(body))
                except Exception:
                    continue
                for labels, samples in series:
                    rows.append(
                        {
                            "labels": [
                                {"name": n, "value": v} for n, v in labels
                            ],
                            "samples": [
                                {"value": v, "timestamp_ms": t}
                                for v, t in samples
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=["labels", "samples"])

    return bodies.mapInPandas(run, SERIES_SCHEMA)


def otlp_to_points(
    bodies: DataFrame, version: Column | int = 0, body_col: str = "body"
) -> DataFrame:
    """OTLP request bodies -> canonical points, through the SAME
    canonicalization/NaN/ms->s path as Prometheus remote-write."""
    return prometheus_series_to_points(
        decode_otlp_requests(bodies, body_col), version
    )
