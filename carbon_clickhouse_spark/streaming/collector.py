"""Self-metrics collector (S7) — ``carbon/collector.go:44-318``.

The reference emits its own counters (metricsReceived, errors,
writtenBytes, ...) as graphite points every ``metric-interval`` into
the same pipeline, under ``<prefix>.<hostname>.<stat>``. Spark's
equivalent signal source is the StreamingQueryListener; this collector
turns query-progress events into points rows appended to the points
table (or any sink callback).
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming.listener import (
    QueryProgressEvent,
    StreamingQueryListener,
)


class SelfMetricsCollector(StreamingQueryListener):
    """Emit ingest pipeline stats as graphite points.

    graphite_prefix mirrors ``metric-prefix`` (default
    ``carbon.agents.{host}``); stats mirror the reference's counter
    names where a Spark equivalent exists.
    """

    def __init__(
        self,
        spark: SparkSession,
        points_path: str,
        prefix: str = "carbon.agents.{host}",
    ) -> None:
        self.spark = spark
        self.points_path = points_path
        host = socket.gethostname().replace(".", "_")
        self.prefix = prefix.replace("{host}", host)
        self._buffer: list[tuple[str, float, int]] = []

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: QueryProgressEvent) -> None:  # noqa: N802
        p = event.progress
        now = int(time.time())
        stats = {
            "metricsReceived": float(p.numInputRows),
            "processedRowsPerSecond": float(p.processedRowsPerSecond or 0.0),
            "inputRowsPerSecond": float(p.inputRowsPerSecond or 0.0),
            "batchId": float(p.batchId),
        }
        self._buffer.extend(
            (f"{self.prefix}.{name}", value, now) for name, value in stats.items()
        )
        self.flush()

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.flush()

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # ---------------------------------------------------------------------
    def flush(self) -> None:
        if not self._buffer:
            return
        rows, self._buffer = self._buffer, []
        from pyspark.sql import functions as F

        df = self.spark.createDataFrame(rows, "path string, value double, time long")
        (
            df.select(
                "path",
                "value",
                "time",
                F.to_date(F.timestamp_seconds("time")).alias("date"),
                F.col("time").alias("version"),
            )
            .withColumn("month", F.date_format("date", "yyyyMM"))
            .write.mode("append")
            .partitionBy("month")
            .parquet(self.points_path)
        )
