"""Stateful in-stream exists-cache (A2) — ``uploader/cached.go`` as a
Spark stateful operator.

The reference keeps a sharded concurrent map ``days:hash(name) ->
first-seen ts`` with a TTL sweep (``uploader/cmap.go:97-124``) so each
series uploads its index/tagged rows once. The storage-backed
anti-join (``operators.dedup.new_series_only``) is the durable form;
this module is the low-latency in-stream form using
``applyInPandasWithState``: state lives in the streaming state store,
keyed by series, expiring after ``ttl_seconds`` — the same shape as
the reference's cache, but partitioned across executors and
checkpointed (a restart keeps the cache; SIGUSR1's Reset() equals
dropping the state directory).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_seen_batch", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def new_keys_stream(
    keyed: DataFrame, ttl_seconds: int = 86400, key_col: str = "key"
) -> DataFrame:
    """Streaming DF of key strings -> streaming DF of keys seen for
    the FIRST time within the TTL window.

    Usage: derive the series key (e.g. ``concat(date, ':', path)``) in
    the stream, run this, and join back / write index rows for the
    emitted keys only.
    """

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = not state.exists
        # drain the group's rows (content irrelevant beyond presence)
        for _ in pdfs:
            pass
        if first:
            state.update((True,))
        state.setTimeoutDuration(ttl_seconds * 1000)
        if first:
            yield pd.DataFrame({"key": [key[0]], "first_seen_batch": [0]})

    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
