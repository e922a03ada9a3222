"""Config-launched e2e for the reference's remaining test scenarios.

``tests/plain-nodaily/`` and ``tests/tls/`` boot carbon-clickhouse
from a TOML template, feed graphite lines over live TCP, and diff
golden SELECTs against a Dockerized ClickHouse
(``cmd/e2e-test/e2etesting.go:113-155``). No Docker here: the
ClickHouse half is the strict in-process simulator over REAL
HTTP/HTTPS (``sinks/chsim.ClickHouseSim``), everything else — config
file, live TCP receiver, streaming pipeline, gzip/TLS upload hop — is
the production path (``python -m carbon_clickhouse_spark --config``
wiring via ``launch()``).
"""

import ssl
import time

import pytest

from carbon_clickhouse_spark.__main__ import launch
from carbon_clickhouse_spark.config import load_config
from carbon_clickhouse_spark.sinks.chsim import ClickHouseSim
from carbon_clickhouse_spark.streaming.receivers import send_lines

from .test_golden_e2e import INPUT_LINES
from .test_sinks import _make_certs

DAY = 18813  # 2021-07-05
TREE_DAY = 42  # 1970-02-12, the reference's fixed tree date


def _launch_and_feed(spark, cfg, lines, sim, table="graphite", want=1):
    receivers, queries = launch(cfg, spark, upload=True)
    try:
        rx = receivers[0]
        send_lines("127.0.0.1", rx.port, lines)
        deadline = time.time() + 120
        while time.time() < deadline and len(sim.rows(table)) < want:
            time.sleep(0.5)
        for q in queries:
            assert q.exception() is None
    finally:
        for rx in receivers:
            rx.stop()
        for q in queries:
            q.stop()


def test_plain_nodaily_scenario(spark, tmp_path):
    """tests/plain-nodaily/: ``disable-daily-index = true`` on the
    index upload — the index golden (test.toml:107-116) holds ONLY
    tree-level rows; daily (level, level+10000) rows must not upload.
    Points/reverse stay zero-timestamp like the plain scenario."""
    sim = ClickHouseSim()
    url = sim.start()
    conf = tmp_path / "carbon-clickhouse.conf"
    conf.write_text(
        f"""
[data]
path = "{tmp_path / 'data'}"
chunk-interval = "500ms"

[upload.graphite_index]
type = "index"
table = "graphite_index"
url = "{url}/"
cache-ttl = "1h"
disable-daily-index = true

[upload.graphite_tags]
type = "tagged"
table = "graphite_tags"
url = "{url}/"
cache-ttl = "1h"

[upload.graphite_reverse]
type = "points-reverse"
table = "graphite_reverse"
url = "{url}/"
zero-timestamp = true

[upload.graphite]
type = "points"
table = "graphite"
url = "{url}/"
zero-timestamp = true

[tcp]
listen = "127.0.0.1:0"
enabled = true
drop-future = "0s"
drop-past = "0s"
"""
    )
    cfg = load_config(str(conf))
    assert cfg.ingest().disable_daily_index is True
    sim.kinds["graphite_tags"] = "tagged"
    sim.kinds["graphite_reverse"] = "points"
    try:
        _launch_and_feed(spark, cfg, INPUT_LINES, sim, want=2)
        deadline = time.time() + 60
        while time.time() < deadline and not any(
            p.startswith("test.") or p.endswith(".test")
            for _, _, p, _ in sim.rows("graphite_index")
        ):
            time.sleep(0.5)
    finally:
        sim.stop()

    # test.toml:107-116 — tree rows only, NO daily rows
    idx = sorted(
        (d, lvl, p)
        for d, lvl, p, ver in sim.rows("graphite_index")
        if p.startswith("test.") or p.endswith(".test")
    )
    assert idx == [
        (TREE_DAY, 20001, "test."),
        (TREE_DAY, 20002, "test.host1."),
        (TREE_DAY, 20003, "test.host1.cpu."),
        (TREE_DAY, 20004, "test.host1.cpu.loadavg"),
        (TREE_DAY, 30004, "loadavg.cpu.host1.test"),
    ]
    # no daily rows for ANY path (the nodaily contract, not just test.*)
    assert not [
        (d, lvl, p)
        for d, lvl, p, _ in sim.rows("graphite_index")
        if lvl < 20000
    ]
    # test.toml:117-121 — zero-timestamp points golden
    pts = sorted(
        (
            (p, v, t, d, ver)
            for p, v, t, d, ver in sim.rows("graphite")
            if p.startswith("test.")
        ),
        key=lambda r: r[2],
    )
    assert pts == [
        ("test.host1.cpu.loadavg", 10.2, 1625478240, DAY, 0),
        ("test.host1.cpu.loadavg", 9.4, 1625478300, DAY, 0),
    ]
    # test.toml:123-127 — reverse points golden
    rev = sorted(
        (p, v, t, d, ver)
        for p, v, t, d, ver in sim.rows("graphite_reverse")
        if p.endswith(".test")
    )
    assert rev == [
        ("loadavg.cpu.host1.test", 9.4, 1625478300, DAY, 0),
        ("loadavg.cpu.host1.test", 10.2, 1625478240, DAY, 0),
    ]
    # tagged golden (test.toml:131-141): last duplicate tag wins
    tags = sorted(
        (d, t1, p)
        for d, t1, p, _, _ in sim.rows("graphite_tags")
        if p.startswith("cpu.loadavg")
    )
    assert tags == [
        (DAY, "__name__=cpu.loadavg", "cpu.loadavg?env=test&host=host1"),
        (DAY, "env=test", "cpu.loadavg?env=test&host=host1"),
        (DAY, "host=host1", "cpu.loadavg?env=test&host=host1"),
    ]


def test_tls_scenario(spark, tmp_path):
    """tests/tls/: the upload hop is mTLS — client cert REQUIRED by
    the server, CA-pinned server verification, min-version and
    cipher-suite constraints honored. The reference splits TLS/plain
    per-uploader; the Spark sink posts all tables to one endpoint
    (config.py clickhouse_target docstring), so every table takes the
    TLS hop — a strict superset of the scenario."""
    certs = _make_certs(str(tmp_path))
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(certs["server.crt"], certs["server.key"])
    srv_ctx.load_verify_locations(cafile=certs["ca.crt"])
    srv_ctx.verify_mode = ssl.CERT_REQUIRED  # mTLS

    sim = ClickHouseSim()
    url = sim.start(ssl_context=srv_ctx)
    assert url.startswith("https://")
    conf = tmp_path / "carbon-clickhouse.conf"
    conf.write_text(
        f"""
[data]
path = "{tmp_path / 'data'}"
chunk-interval = "500ms"

[upload.graphite]
type = "points"
table = "graphite"
url = "{url}/"
zero-timestamp = true
[upload.graphite.tls]
ca-cert = [ "{certs['ca.crt']}" ]
server-name = "localhost"
insecure-skip-verify = false
min-version = "TLS12"
[[upload.graphite.tls.certificates]]
key = "{certs['client.key']}"
cert = "{certs['client.crt']}"

[upload.graphite_index]
type = "index"
table = "graphite_index"
url = "{url}/"

[tcp]
listen = "127.0.0.1:0"
enabled = true
drop-future = "0s"
drop-past = "0s"
"""
    )
    cfg = load_config(str(conf), exact=True)
    target = cfg.clickhouse_target()
    assert target.tls is not None and target.tls.min_version == "TLS12"
    try:
        _launch_and_feed(spark, cfg, INPUT_LINES, sim, want=2)
    finally:
        sim.stop()

    pts = sorted(
        (p, v, t, d, ver)
        for p, v, t, d, ver in sim.rows("graphite")
        if p.startswith("test.")
    )
    assert pts == [
        ("test.host1.cpu.loadavg", 9.4, 1625478300, DAY, 0),
        ("test.host1.cpu.loadavg", 10.2, 1625478240, DAY, 0),
    ]
    # every request negotiated >= TLS 1.2 and presented the client
    # cert the server demanded
    assert sim.requests
    for r in sim.requests:
        assert r["tls_version"] in ("TLSv1.2", "TLSv1.3")
        assert r["tls_cipher"]
        subj = {
            k: v for rdn in (r["tls_peer"] or ()) for (k, v) in rdn
        }
        assert subj.get("commonName") == "uploader"


def test_tls_min_version_enforced(spark, tmp_path):
    """min-version = "TLS13" against a server capped at TLS 1.2 must
    FAIL the handshake — the constraint is enforced, not decorative
    (helper/config/tls.go:34-38)."""
    from carbon_clickhouse_spark.sinks.clickhouse import (
        TLSConfig,
        insert_points,
    )

    certs = _make_certs(str(tmp_path))
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(certs["server.crt"], certs["server.key"])
    srv_ctx.maximum_version = ssl.TLSVersion.TLSv1_2

    sim = ClickHouseSim()
    url = sim.start(ssl_context=srv_ctx)
    tls = TLSConfig(
        ca_certs=[certs["ca.crt"]],
        server_name="localhost",
        min_version="TLS13",
    )
    df = (
        spark.createDataFrame(
            [("m.one", 1.5, 1625478240, 0)],
            "path string, value double, time long, version long",
        ).coalesce(1)
    )
    try:
        with pytest.raises(Exception, match="(?i)protocol version|ssl"):
            insert_points(
                df, url, "graphite", tls=tls, retries=0, retry_delay_s=0.0
            )
        assert not sim.rows("graphite")
        # the same server accepts a TLS12-minimum client: the failure
        # above was the version constraint, not the server setup
        tls_ok = TLSConfig(
            ca_certs=[certs["ca.crt"]],
            server_name="localhost",
            min_version="TLS12",
        )
        insert_points(
            df, url, "graphite", tls=tls_ok, retries=0, retry_delay_s=0.0
        )
        assert len(sim.rows("graphite")) == 1
    finally:
        sim.stop()


def test_tls_curves_pinned_and_validated(spark, tmp_path):
    """[upload.*.tls] curves: valid reference names pin the ECDH group
    and the handshake still completes; an unknown name fails loudly
    (helper/config/tls.go ParseCurves); client-auth + multi-curve
    lists surface in divergences() instead of being silently eaten."""
    from carbon_clickhouse_spark.config import load_config
    from carbon_clickhouse_spark.sinks.clickhouse import (
        TLSConfig,
        insert_points,
    )

    certs = _make_certs(str(tmp_path))
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(certs["server.crt"], certs["server.key"])
    sim = ClickHouseSim()
    url = sim.start(ssl_context=srv_ctx)
    df = spark.createDataFrame(
        [("m.c", 2.0, 1625478240, 0)],
        "path string, value double, time long, version long",
    ).coalesce(1)
    try:
        tls = TLSConfig(
            ca_certs=[certs["ca.crt"]], server_name="localhost",
            curves=["CurveP256"],
        )
        insert_points(df, url, "graphite", tls=tls, retries=0, retry_delay_s=0.0)
        assert len(sim.rows("graphite")) == 1
        with pytest.raises(ValueError, match="invalid curve name"):
            TLSConfig(curves=["NoSuchCurve"]).ssl_context()
    finally:
        sim.stop()

    conf = tmp_path / "c.conf"
    conf.write_text(
        f"""
[data]
path = "{tmp_path / 'data'}"

[upload.graphite]
type = "points"
table = "graphite"
url = "https://127.0.0.1:1/"
[upload.graphite.tls]
ca-cert = [ "{certs['ca.crt']}" ]
client-auth = "RequireAndVerifyClientCert"
curves = [ "X25519", "CurveP384" ]

[tcp]
listen = "127.0.0.1:0"
enabled = true
"""
    )
    cfg = load_config(str(conf), exact=True)
    tls = cfg.clickhouse_target().tls
    assert tls.client_auth == "RequireAndVerifyClientCert"
    assert tls.curves == ["X25519", "CurveP384"]
    notes = "\n".join(cfg.divergences())
    assert "client-auth" in notes and "curves" in notes
