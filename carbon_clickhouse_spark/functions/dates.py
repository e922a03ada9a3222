"""Timestamp -> Date conversion (UTC).

The reference's default local-TZ date path is documented as broken
(``README.md:80-83``); we implement the ``utc-date=true`` behavior
(``carbon/config.go:300-302``, ``helper/RowBinary/date.go:72-74``):
date = days-since-epoch of the uint32 unix timestamp, in UTC.

Sessions created via :mod:`carbon_clickhouse_spark.session` pin
``spark.sql.session.timeZone=UTC`` so ``from_unixtime``/``to_date``
match this exactly.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed tree-row date: day 42 = 1970-02-12 (``uploader/index.go:25``).
TREE_DATE = _dt.date(1970, 2, 12)


def ts_to_date(ts: Column | str) -> Column:
    """Unix seconds -> UTC DATE (ref ``helper/RowBinary/date.go:72-74``)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(F.timestamp_seconds(col))


def tree_date() -> Column:
    return F.lit(TREE_DATE)
