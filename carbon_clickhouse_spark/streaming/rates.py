"""Live counter rates: ClickHouse ``deltaSumTimestamp`` /
Prometheus-style ``increase()`` over the ingest stream, per series,
with watermark-correct out-of-order handling.

The batch :func:`..operators.events_analytics.delta_sum` sums
positive consecutive deltas in event-time order. A stream delivers
points out of order, and a delta folded too early cannot be unfolded
when an earlier point arrives — so, exactly like
:mod:`.funnel`, points buffer in the state store until the query
watermark freezes them, then the frozen prefix folds in exact time
order onto the running (last point, accumulated increase) state.
Spark's watermark contract guarantees no later batch delivers a point
STRICTLY OLDER than the watermark, so the fold freezes only
``t < watermark`` (a point at exactly ``t == watermark`` may still
arrive and stays buffered) — folded state is never wrong, only as
current as the watermark.

Scale shape: state per series is ONE (t, v) pair + one double + a
buffer bounded by (watermark delay x that series' point rate); points
shuffle once on the series key into the state store. Output is an
update-mode running total ``(path, delta_sum, last_time, n_points,
ver)`` emitted whenever a batch folds new points for the series —
downstream rate panels subtract consecutive snapshots.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def streaming_delta_sum(
    points: DataFrame,
    value_col: str = "value",
    time_col: str = "time",
    series_col: str = "path",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Per-series running ``deltaSum`` over a STREAMING points frame
    (``time_col`` = epoch seconds, long). Returns an update-mode
    stream ``(series_col, delta_sum double, last_time long,
    n_points long, ver long)``.

    Counter resets (a drop in value) contribute nothing, matching the
    batch operator. ``state_ttl_seconds`` evicts idle series
    (processing-time timeout); eviction first folds-and-emits any
    still-buffered points (nothing is silently dropped), then forgets
    the series, so one that later resumes restarts its fold — the
    cold-key cache trade-off, stated rather than silent.
    """
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    s_type = points.schema[series_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(series_col, s_type),
            T.StructField("delta_sum", T.DoubleType()),
            T.StructField("last_time", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    # (last folded point, accumulator, frozen-through watermark,
    # pending out-of-order buffer)
    state_schema = T.StructType(
        [
            T.StructField("last_t", T.LongType()),
            T.StructField("last_v", T.DoubleType()),
            T.StructField("acc", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("ver", T.LongType()),
            T.StructField("buf_t", T.ArrayType(T.LongType())),
            T.StructField("buf_v", T.ArrayType(T.DoubleType())),
            T.StructField("last_wm", T.LongType()),
        ]
    )

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            # fold-and-emit any still-buffered points before
            # forgetting the series — eviction must not silently
            # drop data the watermark hadn't frozen yet
            last_t, last_v, acc, n, ver, buf_t, buf_v, _ = state.get
            last_v = None if last_v is None else float(last_v)
            acc, n = float(acc or 0.0), int(n or 0)
            folded = 0
            for t, v in sorted(
                zip([int(t) for t in buf_t or []], list(buf_v or []))
            ):
                if last_v is not None and v > last_v:
                    acc += v - last_v
                last_t, last_v = t, v
                folded += 1
            state.remove()
            if folded:
                yield pd.DataFrame(
                    {
                        series_col: [key[0]],
                        "delta_sum": [acc],
                        "last_time": [int(last_t)],
                        "n_points": [n + folded],
                        "ver": [int(ver or 0) + 1],
                    }
                )
            return
        if state.exists:
            last_t, last_v, acc, n, ver, buf_t, buf_v, last_wm = state.get
            buf = list(
                zip([int(t) for t in buf_t or []], list(buf_v or []))
            )
            last_t = None if last_t is None else int(last_t)
            last_v = None if last_v is None else float(last_v)
            acc, n, ver = float(acc or 0.0), int(n or 0), int(ver or 0)
            last_wm = None if last_wm is None else int(last_wm)
        else:
            last_t, last_v, acc, n, ver = None, None, 0.0, 0, 0
            buf, last_wm = [], None
        for pdf in pdfs:
            for t, v in zip(pdf["__t"], pdf["__v"]):
                # null times (unparseable) and null/NaN values are
                # droppable malformed input, not a stream crash
                if pd.isna(t) or pd.isna(v):
                    continue
                if last_wm is not None and int(t) < last_wm:
                    continue  # late beyond the already-folded line
                    # (fold freezes strictly below last_wm, so a
                    # point at exactly t == last_wm is NOT folded
                    # yet and must be accepted)
                buf.append((int(t), float(v)))
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms // 1000
        if last_wm is not None and last_wm > wm:
            wm = last_wm
        # Spark reports 0 before any watermark exists: fold nothing
        # then (pre-epoch points would fold prematurely otherwise)
        no_wm = last_wm is None and wm_ms == 0
        buf.sort()
        # freeze STRICTLY below the watermark: Spark only guarantees
        # rows older than the watermark stop arriving, so a point at
        # exactly t == wm may still show up in a later batch
        cut = 0
        while not no_wm and cut < len(buf) and buf[cut][0] < wm:
            cut += 1
        frozen, buf = buf[:cut], buf[cut:]
        folded = 0
        for t, v in frozen:
            if last_v is not None and v > last_v:
                acc += v - last_v
            last_t, last_v = t, v
            folded += 1
        n += folded
        if folded:
            ver += 1
        state.update(
            (
                last_t,
                last_v,
                acc,
                n,
                ver,
                [t for t, _ in buf],
                [v for _, v in buf],
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if folded:
            yield pd.DataFrame(
                {
                    series_col: [key[0]],
                    "delta_sum": [acc],
                    "last_time": [int(last_t)],
                    "n_points": [n],
                    "ver": [ver],
                }
            )

    keyed = (
        points.select(
            F.col(series_col),
            F.timestamp_seconds(F.col(time_col)).alias("__event_ts"),
            F.col(time_col).cast("long").alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
        # watermark on the surviving column, as in streaming/funnel.py
        .withWatermark("__event_ts", watermark_delay)
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(series_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
