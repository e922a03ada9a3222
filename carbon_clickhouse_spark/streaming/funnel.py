"""Streaming ``windowFunnel``: the ClickHouse funnel aggregate
(operators/events_analytics.py) over a LIVE event stream, with
watermark-correct out-of-order handling.

The batch funnel is a running-max DP over each user's events in time
order. A stream delivers events out of order, and the DP cannot
retroactively insert an event before state it already folded — so
this operator buffers each user's events in the state store until the
query watermark passes them, then folds the now-frozen prefix in
exact time order. Spark's watermark contract guarantees no later
batch delivers an event STRICTLY OLDER than the watermark (later rows
are dropped at the source by ``withWatermark``), so the fold freezes
only ``t < watermark`` — an event at exactly ``t == watermark`` may
still arrive and stays buffered — and folded state is never wrong,
only as current as the watermark.

Scale shape: state per user is O(n_steps) folded chain starts plus a
buffer bounded by (watermark delay x that user's event rate) — the
same bound every watermarked streaming aggregate carries. Events
shuffle once on the user key into the state store; there is no
per-batch join and nothing global. Output is append-mode milestone
rows ``(user, funnel_level, reached_at)`` emitted when a user's
deepest reached step increases — at most n_steps rows per user ever.

Parity: folding the frozen prefix through ``_fold`` is the same DP as
``window_funnel`` (chain-start running max, strictly-earlier-event
chaining via descending step order), asserted in tests by comparing a
replayed stream against the batch operator on identical data.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _fold(levels, events, steps, window):
    """Fold time-ordered ``(t, type)`` events into the chain-start DP
    state ``levels`` (best chain START reaching step k, or None).
    Descending step order keeps one event from serving two steps.

    Returns ``(levels, reached)`` where ``reached[k-1]`` is the event
    time at which step k was completed for the FIRST time during THIS
    fold (None if it was already complete or still isn't) — the
    timestamp a milestone row should carry."""
    n = len(steps)
    reached = [None] * n
    for t, ty in events:
        for k in range(n, 1, -1):
            prev = levels[k - 2]
            if (
                ty == steps[k - 1]
                and prev is not None
                and t - prev <= window
            ):
                if levels[k - 1] is None:
                    reached[k - 1] = t
                if levels[k - 1] is None or prev > levels[k - 1]:
                    levels[k - 1] = prev
        if ty == steps[0]:
            if levels[0] is None:
                reached[0] = t
            if levels[0] is None or t > levels[0]:
                levels[0] = t
    return levels, reached


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Streaming sessionization with Spark's NATIVE session windows —
    no custom state code at all: ``session_window`` merges events
    closer than ``gap`` into one growing window per user, the
    watermark finalizes a session once no event can extend it, and
    append mode emits each session exactly once as
    ``(user_col, session_start, session_end, n_events)``.

    Session end is last-event-time + gap (the Spark/Flink convention;
    the batch ``sessionization`` query reports max-min duration
    instead — both are standard, documented here so the two aren't
    diffed naively). State per user is one open session row, expired
    by the watermark — the native operator IS the scale design.
    """
    return (
        events.withWatermark(time_col, watermark_delay)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(time_col), gap),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window: int,
    time_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming funnel over an event stream with an event-time
    ``time_col`` (TIMESTAMP). Returns an append-mode stream of
    milestone rows ``(user_col, funnel_level int, reached_at long)``
    — one row each time a user's deepest step so far increases.

    ``window`` is in SECONDS of event time. ``state_ttl_seconds``
    expires idle users' state (processing-time timeout) — set it to
    bound the state store on high-churn keys; expiry forgets chain
    progress, matching an operator that evicts cold users.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    n = len(steps)
    steps = [str(s) for s in steps]
    u_type = events.schema[user_col].dataType

    out_schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("funnel_level", T.IntegerType()),
            T.StructField("reached_at", T.LongType()),
        ]
    )
    # (folded chain starts, emitted level, pending event times+types,
    # watermark already folded through — arrivals strictly below it
    # are late-beyond-the-fold and dropped here even if the engine
    # delivered them, so folding order can never be violated)
    state_schema = T.StructType(
        [
            T.StructField("levels", T.ArrayType(T.LongType())),
            T.StructField("emitted", T.IntegerType()),
            T.StructField("buf_t", T.ArrayType(T.LongType())),
            T.StructField("buf_ty", T.ArrayType(T.StringType())),
            T.StructField("last_wm", T.LongType()),
        ]
    )

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            # TTL expiry of an idle user: fold what the watermark has
            # frozen and emit a final milestone before evicting, so a
            # quiet user's completed funnel is not silently lost
            levels_raw, emitted, buf_t, buf_ty, _ = state.get
            levels = [
                None if v is None else int(v) for v in (levels_raw or [])
            ]
            if len(levels) != n:
                levels = [None] * n
            wm = state.getCurrentWatermarkMs() // 1000
            frozen = sorted(
                (int(t), str(ty))
                for t, ty in zip(buf_t or [], buf_ty or [])
                if int(t) < wm
            )
            levels, reached = _fold(levels, frozen, steps, window)
            level = 0
            for k in range(n, 0, -1):
                if levels[k - 1] is not None:
                    level = k
                    break
            state.remove()
            if level > (emitted or 0):
                yield pd.DataFrame(
                    {
                        user_col: [key[0]],
                        "funnel_level": [int(level)],
                        "reached_at": [int(reached[level - 1] or 0)],
                    }
                )
            return
        if state.exists:
            levels_raw, emitted, buf_t, buf_ty, last_wm = state.get
            levels = [
                None if v is None else int(v) for v in (levels_raw or [])
            ]
            if len(levels) != n:
                levels = [None] * n
            buf = list(zip([int(t) for t in buf_t or []], buf_ty or []))
            # None = nothing folded yet (a 0 default would drop
            # legitimate events at or before the 1970 epoch)
            last_wm = None if last_wm is None else int(last_wm)
        else:
            levels, emitted, buf, last_wm = [None] * n, 0, [], None
        for pdf in pdfs:
            buf.extend(
                (int(v), str(ty))
                for v, ty in zip(pdf["__t"], pdf["__ty"])
                # null event times (unparseable timestamps) are
                # droppable malformed input, not a stream crash
                # accept t == last_wm: the fold freezes strictly
                # below the watermark, so that event is NOT folded
                # yet — and Spark only guarantees rows strictly older
                # than the watermark stop arriving
                if not pd.isna(v)
                and (last_wm is None or int(v) >= last_wm)
            )
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms // 1000
        if last_wm is not None and last_wm > wm:
            wm = last_wm
        # Spark reports 0 before any watermark exists: fold nothing
        # then, or pre-epoch (t <= 0) events would fold prematurely
        no_wm = last_wm is None and wm_ms == 0
        buf.sort()
        cut = 0
        while not no_wm and cut < len(buf) and buf[cut][0] < wm:
            cut += 1
        frozen, buf = buf[:cut], buf[cut:]
        levels, reached = _fold(levels, frozen, steps, window)
        level = 0
        for k in range(n, 0, -1):
            if levels[k - 1] is not None:
                level = k
                break
        state.update(
            (
                [None if v is None else int(v) for v in levels],
                int(max(level, emitted)),
                [t for t, _ in buf],
                [ty for _, ty in buf],
                # a 0 watermark means "none yet" (Spark's initial
                # value): keep None so pre-epoch events aren't dropped
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if level > emitted:
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "funnel_level": [int(level)],
                    # the event that completed the new deepest step —
                    # not the last frozen event, which may be unrelated
                    "reached_at": [int(reached[level - 1] or 0)],
                }
            )

    keyed = (
        events.select(
            F.col(user_col),
            F.col(time_col).cast("timestamp").alias("__event_ts"),
            F.unix_timestamp(F.col(time_col).cast("timestamp")).alias(
                "__t"
            ),
            F.col(type_col).cast("string").alias("__ty"),
        )
        # watermark goes on the column that survives to the stateful
        # operator, so the marker isn't lost to a later projection
        .withWatermark("__event_ts", watermark_delay)
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
