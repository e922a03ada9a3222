"""Drop-in runner: start the engine from a reference-format
``carbon-clickhouse.conf``.

    python -m carbon_clickhouse_spark --config /etc/carbon-clickhouse.conf

A user of go-graphite's carbon-clickhouse keeps their config file:
``[tcp]/[udp]`` listen addresses become live socket receivers landing
chunk files (``streaming/receivers.py``), ``[data]`` drives the
micro-batch trigger and landing path, receiver drop rules and
``[upload.*]`` filter options flow into the four-table Structured
Streaming pipeline (``streaming/ingest.py``). Tables are written as
parquet under ``<data path>/tables/{points,index,tagged,dropped}`` —
the ClickHouse INSERT sink (``sinks/clickhouse.py``) attaches where
an ``[upload.*].url`` points at a live server.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_listen(addr: str, default_port: int) -> tuple[str, int]:
    """Go-style listen address: ':2003' (all interfaces) or
    'host:port'. Empty -> all interfaces on the default port."""
    host, _, port = (addr or "").rpartition(":")
    return host or "0.0.0.0", int(port) if port else default_port


def launch(cfg, spark, data_root: str | None = None):
    """Start receivers + the streaming pipeline for an EngineConfig.
    Returns (receivers, streaming_query); caller owns shutdown."""
    from .streaming.ingest import file_landing_source, start_plain_ingest
    from .streaming.receivers import PlainLineReceiver

    base = data_root or cfg.data_path
    landing = os.path.join(base, "landing")
    tables = os.path.join(base, "tables")
    os.makedirs(landing, exist_ok=True)

    receivers = []
    tcp = cfg.receivers.get("tcp")
    udp = cfg.receivers.get("udp")
    want_tcp = bool(tcp and tcp.enabled)
    want_udp = bool(udp and udp.enabled)
    if want_tcp or want_udp:
        thost, tport = parse_listen(tcp.listen if tcp else "", 2003)
        uhost, uport = parse_listen(udp.listen if udp else "", 2003)
        rx = PlainLineReceiver(
            landing,
            host=thost if want_tcp else uhost,
            port=tport if want_tcp else 0,
            tcp=want_tcp,
            udp=want_udp,
            udp_port=uport,
            flush_interval=min(cfg.chunk_interval_s, 1.0),
        ).start()
        receivers.append(rx)

    query = start_plain_ingest(
        spark, file_landing_source(spark, landing), cfg.stream(root=tables)
    )
    return receivers, query


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="carbon_clickhouse_spark",
        description="run the PySpark carbon-clickhouse engine from a "
        "reference TOML config",
    )
    ap.add_argument("--config", required=True, help="carbon-clickhouse.conf path")
    ap.add_argument("--master", default=None, help="Spark master override")
    ap.add_argument(
        "--data-root", default=None,
        help="override [data] path (landing + tables live under it)",
    )
    args = ap.parse_args(argv)

    from .config import load_config
    from .session import get_spark

    cfg = load_config(args.config)
    spark = get_spark(app_name="carbon-clickhouse-spark", master=args.master)
    receivers, query = launch(cfg, spark, data_root=args.data_root)
    for rx in receivers:
        print(f"listening tcp={rx.port} udp={rx.udp_port}", flush=True)
    try:
        while query.isActive:
            time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        for rx in receivers:
            rx.stop()
        query.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
