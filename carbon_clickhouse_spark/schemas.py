"""Table contracts (SURVEY §1.3) as Spark schemas.

The reference maintains five ClickHouse table shapes (``README.md:33-63``);
we reproduce them as Parquet/Delta-backed DataFrames:

- ``points`` / ``points_reverse``: the GraphiteMergeTree pair
- ``index``: ReplacingMergeTree(Version) ORDER BY (Level, Path, Date)
- ``tagged``: ReplacingMergeTree(Version) ORDER BY (Tag1, Path, Date)
- ``series`` / ``tree`` (legacy): subsumed by ``index`` levels

Storage layout for 100 TB: partition by month of ``date`` (mirrors
``PARTITION BY toYYYYMM(Date)``), sort within files by ``(path, time)``
so min/max stats give data skipping on both.
"""

from __future__ import annotations

from pyspark.sql import types as T

POINT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("time", T.LongType(), False),  # unix seconds
        T.StructField("date", T.DateType(), False),  # UTC day of time
        T.StructField("version", T.LongType(), False),  # receive time
    ]
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
    ]
)

TAGGED_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("tag1", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
        T.StructField("version", T.LongType(), False),
    ]
)

# Level offsets (``uploader/index.go:21-24``)
REVERSE_LEVEL_OFFSET = 10000
TREE_LEVEL_OFFSET = 20000
REVERSE_TREE_LEVEL_OFFSET = 30000

TABLE_NAMES = ("points", "points_reverse", "index", "tagged")
