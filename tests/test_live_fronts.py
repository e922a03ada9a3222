"""E2e for the binary live fronts (receiver/receiver.go:94-200
scheme-dispatch parity): real bytes at a live port -> landing chunk ->
micro-batch -> correct points rows. Covers pickle (length-framed TCP,
receiver/pickle.go:39-133), Prometheus remote-write (snappy HTTP POST,
receiver/prometheus.go:173-191), and Telegraf HTTP JSON
(receiver/telegraf_http_json.go:141-151). gRPC is import-gated
(grpcio is an optional extra)."""

import http.client
import json
import pickle
import socket
import struct
import time

import pytest

from carbon_clickhouse_spark.sources.snappy_block import (
    SnappyError,
    compress,
    decompress,
)
from carbon_clickhouse_spark.streaming.ingest import (
    StreamConfig,
    binary_landing_source,
    start_pickle_ingest,
    start_prometheus_ingest,
    start_telegraf_ingest,
)
from carbon_clickhouse_spark.streaming.receivers import (
    GrpcCarbonReceiver,
    HttpBodyReceiver,
    PickleReceiver,
    snappy_validator,
)


def _wait_rows(spark, path, want, timeout=60):
    deadline = time.time() + timeout
    rows = []
    while time.time() < deadline:
        try:
            rows = spark.read.parquet(path).collect()
            if len(rows) >= want:
                return rows
        except Exception:
            pass
        time.sleep(0.5)
    return rows


def _stream_cfg(tmp_path):
    return StreamConfig(
        root=str(tmp_path / "tables"),
        chunk_interval="300 milliseconds",
        exists_cache=False,
        audit_dropped=False,
    )


def test_pickle_live_e2e(spark, tmp_path):
    land = str(tmp_path / "landing")
    rx = PickleReceiver(land, flush_interval=0.1).start()
    cfg = _stream_cfg(tmp_path)
    query = start_pickle_ingest(spark, binary_landing_source(spark, land), cfg)
    try:
        frames = [
            pickle.dumps([("pkl.live.a", (1625400000, 1.5))]),
            pickle.dumps(
                [
                    ("pkl.live.b", (1625400001, 2.5)),
                    ("pkl;env=prod", (1625400002, 3.5)),
                ]
            ),
        ]
        wire = b"".join(struct.pack(">I", len(f)) + f for f in frames)
        with socket.create_connection(("127.0.0.1", rx.port)) as s:
            # drip bytes to exercise partial-frame reassembly
            for i in range(0, len(wire), 7):
                s.sendall(wire[i : i + 7])
        rows = _wait_rows(spark, f"{cfg.root}/points", 3)
        got = {(r.path, r.value, r.time) for r in rows}
        assert got == {
            ("pkl.live.a", 1.5, 1625400000),
            ("pkl.live.b", 2.5, 1625400001),
            ("pkl?env=prod", 3.5, 1625400002),
        }
    finally:
        rx.stop()
        query.stop()


def test_pickle_oversized_frame_drops_connection(tmp_path):
    land = str(tmp_path / "landing")
    rx = PickleReceiver(land, flush_interval=0.05).start()
    try:
        good = pickle.dumps([("ok.metric", (1625400000, 1.0))])
        with socket.create_connection(("127.0.0.1", rx.port)) as s:
            s.sendall(struct.pack(">I", len(good)) + good)
            # claim a frame over the 64 MiB cap: connection must drop
            s.sendall(struct.pack(">I", 1 << 30))
            s.settimeout(5)
            assert s.recv(1) == b""  # server closed
        time.sleep(0.2)
        rx.writer.flush()
        import glob

        chunks = glob.glob(f"{land}/*.bin")
        data = b"".join(open(c, "rb").read() for c in chunks)
        # the good frame before the bad length still landed
        from carbon_clickhouse_spark.sources.pickle_source import split_frames

        assert split_frames(data) == [good]
    finally:
        rx.stop()


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


def _post(port, body, path="/write"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    resp.read()
    conn.close()
    return resp.status


def test_prometheus_live_e2e(spark, tmp_path):
    land = str(tmp_path / "landing")
    rx = HttpBodyReceiver(land, validate=snappy_validator, flush_interval=0.1).start()
    cfg = _stream_cfg(tmp_path)
    query = start_prometheus_ingest(spark, binary_landing_source(spark, land), cfg)
    try:
        ts_msg = _label("__name__", "up") + _label("job", "node") + _sample(
            1.5, 1625400000123
        )
        body = bytes([1 << 3 | 2, len(ts_msg)]) + ts_msg
        # a real remote_write client sends snappy block compression
        assert _post(rx.port, compress(body)) == 200
        # undecodable body -> 400, nothing lands (reference behavior)
        assert _post(rx.port, b"\xff\xfe garbage") == 400
        rows = _wait_rows(spark, f"{cfg.root}/points", 1)
        got = {(r.path, r.value, r.time) for r in rows}
        assert got == {("up?job=node", 1.5, 1625400000)}  # ms -> s
    finally:
        rx.stop()
        query.stop()


def test_telegraf_live_e2e(spark, tmp_path):
    land = str(tmp_path / "landing")
    rx = HttpBodyReceiver(land, flush_interval=0.1).start()
    cfg = _stream_cfg(tmp_path)
    query = start_telegraf_ingest(spark, binary_landing_source(spark, land), cfg)
    try:
        body = json.dumps(
            {
                "metrics": [
                    {
                        "name": "cpu",
                        "timestamp": 1625400000,
                        "fields": {"usage": 42.5, "value": 7.0},
                        "tags": {"host": "h1"},
                    }
                ]
            }
        ).encode()
        assert _post(rx.port, body) == 200
        rows = _wait_rows(spark, f"{cfg.root}/points", 2)
        got = {(r.path, r.value, r.time) for r in rows}
        assert got == {
            ("cpu_usage?host=h1", 42.5, 1625400000),
            ("cpu?host=h1", 7.0, 1625400000),  # 'value' field: no concat
        }
    finally:
        rx.stop()
        query.stop()


def test_grpc_front_import_gated(tmp_path):
    pytest.importorskip("grpc", reason="grpcio is an optional extra")
    GrpcCarbonReceiver(str(tmp_path / "landing"))


def test_grpc_front_clear_error_without_grpcio(tmp_path, monkeypatch):
    try:
        import grpc  # noqa: F401

        pytest.skip("grpcio installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="grpcio"):
        GrpcCarbonReceiver(str(tmp_path / "landing"))


def test_snappy_roundtrip_and_vectors():
    import random

    for data in [b"", b"x", b"hello world" * 40, bytes(range(256)) * 300]:
        assert decompress(compress(data)) == data
    rnd = random.Random(1).randbytes(100000)
    assert decompress(compress(rnd)) == rnd
    # hand-built stream with copy elements (the encodings our
    # all-literal compressor never emits): literal 'abc' + overlapping
    # copy-1 (offset 3, len 9) -> 'abcabcabcabc'
    from carbon_clickhouse_spark.sources.snappy_block import _write_uvarint

    s = _write_uvarint(12) + bytes([(3 - 1) << 2]) + b"abc" + bytes(
        [((9 - 4) & 0x7) << 2 | 1, 3]
    )
    assert decompress(s) == b"abcabcabcabc"
    # copy-2: 'ab' then len-4 copy at offset 2 -> 'ababab'
    s2 = (
        _write_uvarint(6)
        + bytes([(2 - 1) << 2])
        + b"ab"
        + bytes([((4 - 1) << 2) | 2])
        + (2).to_bytes(2, "little")
    )
    assert decompress(s2) == b"ababab"
    for bad in [
        b"",
        b"\xff" * 6,  # unterminated uvarint
        _write_uvarint(5) + bytes([(3 - 1) << 2]) + b"abc",  # len mismatch
        _write_uvarint(3) + bytes([1]) + b"\x09",  # copy offset out of range
        compress(b"hello")[:-1],  # truncated literal
    ]:
        with pytest.raises(SnappyError):
            decompress(bad)


def test_snappy_validator():
    assert snappy_validator(compress(b"\x0a\x02hi")) is None
    assert snappy_validator(b"\x0a\x02hi") is None  # raw protobuf ok
    assert snappy_validator(b"\xff\xfe nope") is not None


def test_otlp_live_e2e(spark, tmp_path):
    """Beyond-the-reference front: a real OTLP HTTP POST lands a
    chunk, the micro-batch decodes it through the shared Prometheus
    canonicalization into points."""
    from carbon_clickhouse_spark.streaming.ingest import start_otlp_ingest
    from tests.test_sources import _otlp_fixture

    land = str(tmp_path / "landing")
    rx = HttpBodyReceiver(land, flush_interval=0.1).start()
    cfg = _stream_cfg(tmp_path)
    query = start_otlp_ingest(spark, binary_landing_source(spark, land), cfg)
    try:
        assert _post(rx.port, _otlp_fixture()) == 200
        rows = _wait_rows(spark, f"{cfg.root}/points", 10)
        got = {(r.path, r.value, r.time) for r in rows}
        assert ("cpu_load?env=prod&host=h1", 4.2, 1625478240) in got
        assert ("lat_bucket?host=h1&le=%2BInf", 6.0, 1625478240) in got or (
            "lat_bucket?host=h1&le=+Inf", 6.0, 1625478240) in got
        assert ("rt?host=h1&quantile=0.5", 1.25, 1625478240) in got
    finally:
        rx.stop()
        query.stop()


def test_loadgen_against_live_front(spark, tmp_path):
    """tools/loadgen.py (the reference's loadtest.go analogue) drives
    a live PlainLineReceiver; every generated line lands as a parsed
    point with the loadtest series shape."""
    import json
    import subprocess
    import sys

    from carbon_clickhouse_spark.sources.plain import parse_plain_lines
    from carbon_clickhouse_spark.streaming.ingest import (
        StreamConfig,
        file_landing_source,
        start_plain_ingest,
    )
    from carbon_clickhouse_spark.streaming.receivers import PlainLineReceiver

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "tables")
    rx = PlainLineReceiver(landing, flush_interval=0.2).start()
    q = start_plain_ingest(
        spark,
        file_landing_source(spark, landing),
        StreamConfig(root=root, chunk_interval="500 milliseconds",
                     audit_dropped=False),
    )
    try:
        out = subprocess.run(
            [sys.executable, "tools/loadgen.py", "--port", str(rx.port),
             "--hosts", "3", "--plugins", "2", "--values", "4",
             "--seconds", "2", "--rate", "200"],
            capture_output=True, text=True, timeout=60, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr
        rep = json.loads(out.stdout)
        assert rep["sent"] > 0 and rep["series"] == 24
        import time as _t
        deadline = _t.time() + 60
        n = 0
        while _t.time() < deadline:
            try:
                pts = spark.read.parquet(f"{root}/points")
                n = pts.count()
                if n >= rep["series"]:
                    break
            except Exception:
                pass
            _t.sleep(0.5)
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        rx.stop()
        q.stop()
    from pyspark.sql import functions as F

    pts = spark.read.parquet(f"{root}/points")
    assert pts.filter(
        F.col("path").rlike(r"^loadtest\.host\d+\.plugin\d+\.stuff\d+\.value$")
    ).count() == pts.count()
    assert pts.select("path").distinct().count() == 24
