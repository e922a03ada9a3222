"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same conf block is what we would
ship on a 1000-executor cluster (AQE, skew-join handling, Arrow for the
few pandas UDFs, UTC session time).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "carbon-clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        # deterministic cross-engine comparison + the reference's
        # utc-date behavior (SURVEY §1.4)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # runtime re-planning: coalesce small shuffle partitions,
        # split skewed ones — required posture at 100 TB
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE coalesce target (guide §2.2): post-shuffle partitions in
        # the 100 MB-1 GB band, not the 64 MB default — at cluster
        # scale this halves reduce-side block count; locally every
        # bench shuffle is far below either target so the coalesced
        # plan is identical (verified: leg timings unchanged).
        # Env-tunable for deployments with slower NICs.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_SIZE", "256m"),
        )
        # allow shuffled-hash joins where the per-partition build side
        # fits (guide §3.1): sort-merge's sort is pure overhead for
        # the bounded-summary joins this engine plans; the planner
        # still falls back to SMJ when size conditions fail
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # Arrow batches for the pandas-UDF parity functions
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # metrics points are tiny rows; bigger scan partitions
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long (we floor to seconds ourselves)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[N] puts driver AND all executor threads in one JVM —
        # size the heap for N concurrent tasks, not a thin coordinator
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
