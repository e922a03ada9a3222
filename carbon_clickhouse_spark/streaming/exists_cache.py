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
checkpointed (a restart keeps the cache).

Reset (``carbon/app.go:366-377``: HUP -> ``uploader.Reset()`` clears
the exists map so series re-upload) is an EPOCH bump: state rows carry
the epoch they were written under, and :class:`ExistsCacheControl.
reset` advances the epoch in a small shared file — on the next batch
every key whose state is from an older epoch counts as first-seen
again. No restart, no state-store surgery; executors re-read the
epoch file at most once a second (stale by <= one batch, same window
the reference's async ``go v.Reset()`` allows).
"""

from __future__ import annotations

import os
import time
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
STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("epoch", T.LongType()),
    ]
)

# epoch-file read cache: path -> (checked_at, value). Executors poll
# the file at most once a second — a group-level read per key would
# be thousands of opens per batch.
_EPOCH_CACHE: dict[str, tuple[float, int]] = {}
_EPOCH_TTL_S = 1.0


def read_epoch(path: str | None) -> int:
    """Current reset epoch (0 when unset/missing). Must live on
    storage every executor can read (shared FS / DFS)."""
    if path is None:
        return 0
    now = time.time()
    hit = _EPOCH_CACHE.get(path)
    if hit is not None and now - hit[0] < _EPOCH_TTL_S:
        return hit[1]
    try:
        with open(path) as fh:
            v = int(fh.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        v = 0
    _EPOCH_CACHE[path] = (now, v)
    return v


class ExistsCacheControl:
    """Admin handle for the stateful cache: ``reset()`` is the
    reference's SIGHUP cache clear."""

    def __init__(self, epoch_file: str):
        self.epoch_file = epoch_file

    def epoch(self) -> int:
        return read_epoch(self.epoch_file)

    def reset(self) -> int:
        """Advance the epoch; every cached key becomes unseen on the
        next micro-batch. Returns the new epoch."""
        new = self.epoch() + 1
        tmp = f"{self.epoch_file}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(str(new))
        os.replace(tmp, self.epoch_file)  # atomic swap for readers
        # record the reset wall-clock: the /debug/upload/<t>/cache/
        # dump (query/api.py GraphiteStore.cache_dump) shows only rows
        # versioned AFTER the last reset — the durable-table view of
        # "the cache was cleared" (uploader Reset(), cached.go:58-61)
        tmp_ts = f"{self.epoch_file}.ts.tmp.{os.getpid()}"
        with open(tmp_ts, "w") as fh:
            fh.write(str(int(time.time())))
        os.replace(tmp_ts, f"{self.epoch_file}.ts")
        _EPOCH_CACHE.pop(self.epoch_file, None)
        return new

    def reset_version(self) -> int:
        """Unix time of the last reset (0 = never): table rows with
        ``version <= reset_version()`` count as evicted from the
        logical exists-cache."""
        try:
            with open(f"{self.epoch_file}.ts") as fh:
                return int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            return 0


def new_keys_stream(
    keyed: DataFrame,
    ttl_seconds: int = 86400,
    key_col: str = "key",
    epoch_file: str | None = None,
) -> DataFrame:
    """Streaming DF of key strings -> streaming DF of keys seen for
    the FIRST time within the TTL window (and since the last epoch
    reset, when ``epoch_file`` is given).

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
        epoch = read_epoch(epoch_file)
        first = True
        if state.exists:
            stored = state.get
            # legacy single-field state (pre-epoch) counts as epoch 0
            st_epoch = stored[1] if len(stored) > 1 and stored[1] is not None else 0
            first = st_epoch < epoch  # older epoch -> treat as unseen
        # drain the group's rows (content irrelevant beyond presence)
        for _ in pdfs:
            pass
        if first:
            state.update((True, epoch))
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
