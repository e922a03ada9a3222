"""ClickHouse sink (K5) offline tests + stateful exists-cache."""

import glob
import gzip
import os
import time
import urllib.parse

import pytest

from carbon_clickhouse_spark.sinks.clickhouse import (
    insert_points,
    insert_query_url,
)
from carbon_clickhouse_spark.sources.rowbinary import decode_points


def test_insert_query_url():
    url = insert_query_url("http://ch:8123/", "graphite")
    assert url.startswith("http://ch:8123/?query=")
    q = urllib.parse.unquote(url.split("query=", 1)[1])
    assert q == "INSERT INTO graphite (Path, Value, Time, Date, Timestamp) FORMAT RowBinary"


def test_insert_points_builds_rowbinary(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("a.b", 1.5, 1625478240, 99),
            ("c.d?env=x", 2.5, 1625478300, 99),
        ],
        "path string, value double, time long, version long",
    ).coalesce(1)

    out_dir = str(tmp_path)

    def transport(url, body, headers):
        assert headers["Content-Encoding"] == "gzip"
        fn = os.path.join(out_dir, f"req_{time.time_ns()}.bin")
        with open(fn, "wb") as f:
            f.write(body)
        return 200, {"X-ClickHouse-Exception-Code": "0"}

    insert_points(df, "http://ch:8123", "graphite", transport=transport)

    files = glob.glob(f"{out_dir}/req_*.bin")
    assert len(files) == 1
    decoded = decode_points(gzip.decompress(open(files[0], "rb").read()))
    assert [(p[0], p[1], p[2], p[4]) for p in decoded] == [
        ("a.b", 1.5, 1625478240, 0),       # zero-timestamp default (P13)
        ("c.d?env=x", 2.5, 1625478300, 0),
    ]


def test_insert_points_raises_on_ch_exception(spark):
    df = spark.createDataFrame(
        [("a.b", 1.5, 1625478240, 0)],
        "path string, value double, time long, version long",
    ).coalesce(1)

    def transport(url, body, headers):
        return 200, {"X-ClickHouse-Exception-Code": "241"}

    with pytest.raises(Exception):
        insert_points(df, "http://ch:8123", "graphite", transport=transport)


def test_stateful_exists_cache(spark, tmp_path):
    """applyInPandasWithState dedup: keys emitted only on first sight
    across micro-batches."""
    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.streaming.exists_cache import new_keys_stream

    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.txt").write_text("2021-07-05:a.b\n2021-07-05:c.d\n")

    stream = spark.readStream.text(str(src)).select(F.col("value").alias("key"))
    out = new_keys_stream(stream, ttl_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("new_keys")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from new_keys").collect()[0].c >= 2:
                break
            time.sleep(0.5)
        # second batch repeats one key, adds one new
        (src / "b2.txt").write_text("2021-07-05:a.b\n2021-07-05:e.f\n")
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from new_keys").collect()[0].c >= 3:
                break
            time.sleep(0.5)
        got = {r.key for r in spark.sql("select key from new_keys").collect()}
    finally:
        q.stop()
    assert got == {"2021-07-05:a.b", "2021-07-05:c.d", "2021-07-05:e.f"}


def test_stateful_exists_cache_reset(spark, tmp_path):
    """ExistsCacheControl.reset() (carbon/app.go:366-377's HUP Reset):
    after a reset, already-seen keys are emitted again on the next
    batch — series rows re-insert like the reference's cache clear."""
    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.streaming import exists_cache as ec

    src = tmp_path / "in"
    src.mkdir()
    epoch_file = str(tmp_path / "epoch")
    ctl = ec.ExistsCacheControl(epoch_file)
    (src / "b1.txt").write_text("k1\nk2\n")

    stream = spark.readStream.text(str(src)).select(F.col("value").alias("key"))
    out = ec.new_keys_stream(stream, ttl_seconds=3600, epoch_file=epoch_file)
    q = (
        out.writeStream.format("memory")
        .queryName("reset_keys")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_count(n):
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from reset_keys").collect()[0].c >= n:
                return
            time.sleep(0.5)
        raise AssertionError(f"never reached {n} rows")

    try:
        wait_count(2)
        # repeat without reset: nothing new emitted. (No
        # processAllAvailable here: ProcessingTimeTimeout keeps
        # scheduling timeout batches, so it never returns on this
        # query.) Wait until the b2 file is committed, then check.
        (src / "b2.txt").write_text("k1\n")
        deadline = time.time() + 60
        while time.time() < deadline:
            lp = q.lastProgress
            if lp and lp["batchId"] >= 2:
                break
            time.sleep(0.5)
        assert spark.sql("select count(*) c from reset_keys").collect()[0].c == 2

        assert ctl.reset() == 1
        time.sleep(1.2)  # let executor-side epoch caches (TTL 1s) expire
        (src / "b3.txt").write_text("k1\nk3\n")
        wait_count(4)  # k1 re-emitted after reset + new k3
        rows = spark.sql("select key from reset_keys").collect()
    finally:
        q.stop()
    keys = [r.key for r in rows]
    assert keys.count("k1") == 2  # once before reset, once after
    assert "k3" in keys


def _make_certs(d):
    """Self-signed CA + server (SAN localhost/127.0.0.1) + client."""
    import subprocess

    def run(*args):
        subprocess.run(args, check=True, capture_output=True, cwd=d)

    run("openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes", "-days", "1",
        "-keyout", "ca.key", "-out", "ca.crt", "-subj", "/CN=test-ca")
    for name, cn in (("server", "localhost"), ("client", "uploader")):
        run("openssl", "req", "-newkey", "rsa:2048", "-nodes",
            "-keyout", f"{name}.key", "-out", f"{name}.csr", "-subj", f"/CN={cn}")
        ext = os.path.join(d, f"{name}.ext")
        with open(ext, "w") as fh:
            fh.write("subjectAltName=DNS:localhost,IP:127.0.0.1\n")
        run("openssl", "x509", "-req", "-in", f"{name}.csr", "-CA", "ca.crt",
            "-CAkey", "ca.key", "-CAcreateserial", "-days", "1",
            "-out", f"{name}.crt", "-extfile", ext)
    return {n: os.path.join(d, n) for n in
            ("ca.crt", "server.crt", "server.key", "client.crt", "client.key")}


def test_insert_points_mtls(spark, tmp_path):
    """K5 mTLS e2e (reference tests/tls/ scenario): a local TLS server
    REQUIRING a client certificate accepts the upload only when
    TLSConfig carries the CA + client chain."""
    import http.server
    import ssl
    import threading

    from carbon_clickhouse_spark.sinks.clickhouse import TLSConfig, insert_points

    certs = _make_certs(str(tmp_path))
    got = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            got["body"] = gzip.decompress(body)
            got["query"] = urllib.parse.urlsplit(self.path).query
            got["peer"] = self.connection.getpeercert()["subject"]
            self.send_response(200)
            self.send_header("X-ClickHouse-Exception-Code", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certs["server.crt"], certs["server.key"])
    ctx.load_verify_locations(cafile=certs["ca.crt"])
    ctx.verify_mode = ssl.CERT_REQUIRED  # mTLS: client cert mandatory
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    port = srv.socket.getsockname()[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()

    tls = TLSConfig(
        ca_certs=[certs["ca.crt"]],
        certificates=[(certs["client.crt"], certs["client.key"])],
        server_name="localhost",
    )
    df = spark.createDataFrame(
        [("m.one", 1.5, 1625478240, 0)], "path string, value double, time long, version long"
    ).coalesce(1)
    insert_points(df, f"https://127.0.0.1:{port}", "graphite", tls=tls)
    t.join(timeout=10)
    srv.server_close()

    decoded = decode_points(got["body"])
    assert [(p[0], p[1], p[2]) for p in decoded] == [("m.one", 1.5, 1625478240)]
    assert "INSERT%20INTO%20graphite" in got["query"]
    assert ("commonName", "uploader") in [x for rdn in got["peer"] for x in rdn]

    # without a client certificate the handshake must fail
    srv2 = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    srv2.socket = ctx.wrap_socket(srv2.socket, server_side=True)
    port2 = srv2.socket.getsockname()[1]
    t2 = threading.Thread(target=srv2.handle_request, daemon=True)
    t2.start()
    with pytest.raises(Exception):
        insert_points(
            df, f"https://127.0.0.1:{port2}", "graphite",
            tls=TLSConfig(ca_certs=[certs["ca.crt"]], server_name="localhost"),
            retries=0,  # one-shot server: retrying would wait on a dead port
        )
    srv2.server_close()


def _reference_golden_points():
    """Python replica of the reference uploader golden fixture
    (uploader/write_test.go:37-77 generateMetrics): 2 hosts x 3
    process counters, each as a plain path AND its canonical tagged
    twin, time = version = now, values stepping 0.01. Both sides of
    the pair share one value, exactly like the Go generator."""
    now = 1559465760
    hosts = ["dc1-8d967d8d5-hjxnn", "ad2-adf67d8d5-hjkdk1"]
    names = ["blocked", "zombies", "stopped"]
    points, v = [], 0.0
    for host in hosts:
        for name in names:
            plain = f"telegraph.{host}.processes.{name}"
            tagged = f"{name}?app=telegraph&host={host}&scope=processes"
            points.append((plain, v, now, now))
            points.append((tagged, v, now, now))
            v += 0.01
    return points


def _golden_rowbinary(points):
    """Independent encoder straight from the documented layout
    (helper/RowBinary/write_buffer.go:169-175): uvarint(len)+name,
    float64 LE, uint32 LE time, uint16 LE days, uint32 LE version.
    Deliberately NOT encode_points — this is the cross-check."""
    import struct as st

    out = bytearray()
    for path, value, ts, version in points:
        raw = path.encode()
        n = len(raw)
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                break
        out += raw
        out += st.pack("<d", value)
        out += st.pack("<I", ts)
        out += st.pack("<H", ts // 86400)
        out += st.pack("<I", version)
    return bytes(out)


def test_golden_rowbinary_bytes_plain_and_gzip(spark):
    """The sink must emit byte-identical RowBinary to the reference's
    uploader for its own golden fixture, plain and gzip."""
    import gzip as gz
    import http.server
    import threading

    from carbon_clickhouse_spark.functions.tags import graphite_canonicalize

    points = _reference_golden_points()
    expected = _golden_rowbinary(points)

    # the tagged fixture paths must equal OUR canonicalizer's output
    # for the graphite ';'-form input (helper/tags/graphite.go parity)
    for host in ["dc1-8d967d8d5-hjxnn", "ad2-adf67d8d5-hjkdk1"]:
        got = graphite_canonicalize(
            f"blocked;scope=processes;host={host};app=telegraph"
        )
        assert got == f"blocked?app=telegraph&host={host}&scope=processes"

    bodies = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            ln = int(self.headers.get("Content-Length", 0))
            bodies.append(
                (self.path, dict(self.headers), self.rfile.read(ln))
            )
            self.send_response(200)
            self.send_header("X-ClickHouse-Exception-Code", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.socket.getsockname()[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame(
            [(p, v, ts, ver) for p, v, ts, ver in points],
            "path STRING, value DOUBLE, time LONG, version LONG",
        ).coalesce(1)
        url = f"http://127.0.0.1:{port}"
        insert_points(df, url, "graphite", gzip=False, zero_timestamp=False)
        insert_points(df, url, "graphite", gzip=True, zero_timestamp=False)
    finally:
        srv.shutdown()
        srv.server_close()

    assert len(bodies) == 2
    (path_plain, hdr_plain, body_plain), (_, hdr_gz, body_gz) = bodies
    assert "INSERT%20INTO%20graphite" in path_plain
    assert body_plain == expected  # byte-identical to the reference
    assert hdr_gz.get("Content-Encoding") == "gzip"
    assert gz.decompress(body_gz) == expected
    # and the lz4 spool roundtrip of the same bytes survives
    from carbon_clickhouse_spark.sources.lz4frame import (
        compress_frame,
        decompress_frame,
    )

    assert decompress_frame(compress_frame(expected)) == expected


def test_insert_points_retries_transient_failures(spark):
    """uploader/base.go parity: a failed upload is retried in-task;
    transient failures (connection error, 5xx) succeed on a later
    attempt; a persistent failure surfaces after the retry budget."""
    from carbon_clickhouse_spark.sinks.clickhouse import insert_points

    df = spark.createDataFrame(
        [("m.a", 1.0, 100, 5)], "path string, value double, time long, version long"
    )

    # the transport runs in an executor worker — count attempts via a
    # file the driver can read back, not a driver-side closure var
    import tempfile

    marker = tempfile.mktemp(prefix="ccs_retry_")

    def flaky(url, body, headers):
        import os

        n = sum(1 for _ in open(marker)) if os.path.exists(marker) else 0
        with open(marker, "a") as fh:
            fh.write("x\n")
        if n == 0:
            raise ConnectionError("refused")
        if n == 1:
            return 503, {}
        return 200, {}

    insert_points(
        df.coalesce(1), "http://ch:8123", "graphite",
        transport=flaky, retries=3, retry_delay_s=0.0,
    )
    assert sum(1 for _ in open(marker)) == 3

    def always_down(url, body, headers):
        raise ConnectionError("refused")

    import pytest as _pytest

    with _pytest.raises(Exception, match="refused"):
        insert_points(
            df.coalesce(1), "http://ch:8123", "graphite",
            transport=always_down, retries=2, retry_delay_s=0.0,
        )
