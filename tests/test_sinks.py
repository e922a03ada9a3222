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
        )
    srv2.server_close()
