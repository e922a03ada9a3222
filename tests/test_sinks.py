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
