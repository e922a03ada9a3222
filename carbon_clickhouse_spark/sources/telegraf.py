"""Telegraf HTTP JSON source (S6) — ``receiver/telegraf_http_json.go``.

Input: JSON bodies ``{"metrics": [{"name", "timestamp", "fields": {},
"tags": {}}]}``. One output point per numeric/bool field
(``process``, :76-139):

- JSON numbers pass through; bools -> 1.0/0.0 (:96-105); all other
  field types (including numeric STRINGS) are dropped — so decoding
  must preserve JSON types, which rules out a stringly-typed
  ``from_json`` map. Bodies decode in ``mapInPandas`` with exact
  type checks, mirroring the reference's ``interface{}`` switch.
- NaN dropped (:109)
- path = escape.Path(name) [+ concat + escape.Path(field) unless
  field == "value"] + '?' + sorted query-escaped tags; the reference's
  sort-before-rename and single-tag quirks are preserved in
  ``telegraf_encode_tags``.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from ..functions.dates import ts_to_date
from ..functions.tags import telegraf_metric_path

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("time", T.LongType()),
    ]
)


def telegraf_json_to_points(
    bodies: DataFrame,
    body_col: str = "body",
    version: Column | int = 0,
    concat: str = "_",
) -> DataFrame:
    """JSON request bodies -> canonical points."""
    version_col = F.lit(version).cast("long") if isinstance(version, int) else version

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        path_cache: dict[tuple, str] = {}
        for pdf in batches:
            paths, values, times = [], [], []
            for body in pdf[body_col]:
                try:
                    data = json.loads(body)
                except (ValueError, TypeError):
                    continue
                for m in data.get("metrics") or []:
                    name = m.get("name")
                    ts = m.get("timestamp")
                    if name is None or ts is None:
                        continue
                    try:
                        ts = int(ts)
                    except (ValueError, OverflowError):
                        continue
                    if not -(1 << 63) <= ts < (1 << 63):
                        # would overflow the Arrow int64 column and
                        # kill the whole batch for one bad metric
                        continue
                    tags = m.get("tags") or {}
                    tags_key = tuple(sorted(tags.items()))
                    for field, raw in (m.get("fields") or {}).items():
                        # mirror the Go type switch: float64 or bool only
                        if isinstance(raw, bool):
                            v = 1.0 if raw else 0.0
                        elif isinstance(raw, (int, float)):
                            v = float(raw)
                        else:
                            continue
                        if math.isnan(v):
                            continue
                        key = (name, field, tags_key)
                        path = path_cache.get(key)
                        if path is None:
                            path = path_cache[key] = telegraf_metric_path(
                                name, field, tags, concat
                            )
                        paths.append(path)
                        values.append(v)
                        times.append(ts)
            yield pd.DataFrame({"path": paths, "value": values, "time": times})

    raw = bodies.mapInPandas(run, _RAW_SCHEMA)
    return raw.select(
        "path",
        "value",
        "time",
        ts_to_date("time").alias("date"),
        version_col.alias("version"),
    )
