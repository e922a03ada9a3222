"""E2e for the drop-in runner: a reference-format TOML config drives
live receivers + the streaming pipeline to queryable tables."""

import os
import time

from pyspark.sql import functions as F

from carbon_clickhouse_spark.__main__ import launch, parse_listen
from carbon_clickhouse_spark.config import load_config


def test_parse_listen():
    assert parse_listen(":2003", 0) == ("0.0.0.0", 2003)
    assert parse_listen("127.0.0.1:2004", 0) == ("127.0.0.1", 2004)
    assert parse_listen("", 2003) == ("0.0.0.0", 2003)


def test_launch_from_reference_toml(spark, tmp_path):
    from carbon_clickhouse_spark.streaming.receivers import send_lines

    conf = tmp_path / "carbon-clickhouse.conf"
    conf.write_text(
        """
[data]
path = "%s"
chunk-interval = "500ms"

[tcp]
listen = "127.0.0.1:0"
enabled = true
drop-future = "1h"

[udp]
listen = "127.0.0.1:0"
enabled = true

[upload.graphite]
type = "points"
table = "graphite"

[upload.graphite_index]
type = "index"
table = "graphite_index"
"""
        % str(tmp_path / "data")
    )
    cfg = load_config(str(conf))
    # future drops need a reference clock inside the test data range
    cfg_ingest = cfg.ingest()
    assert cfg_ingest.drop_future_seconds == 3600

    receivers, query = launch(cfg, spark)
    try:
        rx = receivers[0]
        assert rx.port > 0 and rx.udp_port > 0  # both sockets bound
        lines = [f"conf.host{i % 2}.metric {i} {1625400000 + i}" for i in range(100)]
        send_lines("127.0.0.1", rx.port, lines)
        root = str(tmp_path / "data" / "tables")
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(f"{root}/points").count()
                if n >= 100:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert n == 100
        idx = spark.read.parquet(f"{root}/index")
        assert idx.filter(F.col("path") == "conf.host1.metric").count() > 0
    finally:
        for rx in receivers:
            rx.stop()
        query.stop()
