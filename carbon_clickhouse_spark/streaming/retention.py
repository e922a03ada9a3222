"""Streaming cohort retention: the batch
:func:`..operators.events_analytics.retention_cohorts` aggregate over
a LIVE event stream, with watermark-correct out-of-order handling.

The cohort anchor is each user's FIRST anchor-type event — and "first"
can change when an earlier event arrives late, invalidating every
offset computed against the wrong anchor. So, like :mod:`.funnel` and
:mod:`.sequences`, events buffer in the state store until the query
watermark freezes them (strictly below the watermark), then the
frozen prefix folds in exact time order: the anchor settles to the
earliest frozen anchor event — FINAL by construction, since anything
that could precede it is already below a watermark that was folded
through — and each frozen event whose day offset from the anchor is
requested emits one ``(cohort, day_offset, user)`` activation row,
exactly once per (user, offset).

The output is the per-user activation stream — the materialized-view
INPUT: `SELECT cohort, day_offset, count(*) FROM activations GROUP BY
1, 2` (batch, or any downstream consumer) equals the batch operator's
``(cohort, day_offset, n_active)``, asserted by the replay-parity
test. Emitting per-user rows keeps this a single stateful operator
(appending a second streaming aggregation on top of
``applyInPandasWithState`` is restricted); at most ``len(offsets)``
rows per user ever.

Scale shape: state per user is the settled anchor + the emitted-offset
set (<= len(offsets) ints) + the watermark-bounded buffer; events
shuffle once on the user key.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _fold_retention(anchor, emitted, events, anchor_type, offsets):
    """Fold time-ordered frozen ``(t_seconds, type)`` events:
    ``anchor`` is the settled anchor DAY NUMBER (epoch days, None =
    not yet anchored), ``emitted`` the set of offsets already
    activated. Returns (anchor, emitted, new activations list of
    (cohort_day, offset))."""
    out = []
    for t, ty in events:
        day = int(t) // 86400
        if anchor is None and ty == anchor_type:
            anchor = day
        if anchor is None:
            continue
        off = day - anchor
        if off in offsets and off not in emitted:
            emitted.add(off)
            out.append((anchor, off))
    return anchor, emitted, out


def streaming_retention(
    events: DataFrame,
    anchor_type: str,
    offsets: Sequence[int] = (0, 1, 3, 7, 14),
    time_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Append-mode activation stream ``(cohort date, day_offset int,
    user_col)`` — one row the first time a user is active exactly
    ``day_offset`` UTC days after their (settled) first
    ``anchor_type`` event; offset 0 is the anchor day itself.
    ``time_col`` is an event-time TIMESTAMP.

    ``state_ttl_seconds`` evicts idle users after folding their whole
    remaining buffer (nothing observed is silently dropped); a
    returning user re-anchors from scratch — the stated cold-key
    trade-off."""
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    offs = {int(o) for o in offsets}
    if any(o < 0 for o in offs):
        # the fold sees pre-anchor activity before the anchor settles
        # (anchor still None) and skips it, so a negative offset could
        # never activate — refuse instead of silently differing from
        # the batch operator
        raise ValueError("streaming_retention: offsets must be >= 0")
    u_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("cohort", T.DateType()),
            T.StructField("day_offset", T.IntegerType()),
            T.StructField(user_col, u_type),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("anchor_day", T.LongType()),
            T.StructField("emitted", T.ArrayType(T.IntegerType())),
            T.StructField("buf_t", T.ArrayType(T.LongType())),
            T.StructField("buf_ty", T.ArrayType(T.StringType())),
            T.StructField("last_wm", T.LongType()),
        ]
    )

    def _rows(key, acts):
        return pd.DataFrame(
            {
                "cohort": [
                    _dt.date(1970, 1, 1) + _dt.timedelta(days=a)
                    for a, _ in acts
                ],
                "day_offset": pd.array(
                    [o for _, o in acts], dtype="int32"
                ),
                user_col: [key[0]] * len(acts),
            }
        )

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            anchor, emitted_raw, buf_t, buf_ty, _ = state.get
            anchor = None if anchor is None else int(anchor)
            emitted = {int(o) for o in emitted_raw or []}
            buf = sorted(
                (int(t), str(ty))
                for t, ty in zip(buf_t or [], buf_ty or [])
            )
            _, _, acts = _fold_retention(
                anchor, emitted, buf, anchor_type, offs
            )
            state.remove()
            if acts:
                yield _rows(key, acts)
            return
        if state.exists:
            anchor, emitted_raw, buf_t, buf_ty, last_wm = state.get
            anchor = None if anchor is None else int(anchor)
            emitted = {int(o) for o in emitted_raw or []}
            buf = list(
                zip([int(t) for t in buf_t or []], buf_ty or [])
            )
            last_wm = None if last_wm is None else int(last_wm)
        else:
            anchor, emitted, buf, last_wm = None, set(), [], None
        for pdf in pdfs:
            buf.extend(
                (int(t), str(ty))
                for t, ty in zip(pdf["__t"], pdf["__ty"])
                # accept t == last_wm: the fold freezes strictly below
                if not pd.isna(t)
                and (last_wm is None or int(t) >= last_wm)
            )
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms // 1000
        if last_wm is not None and last_wm > wm:
            wm = last_wm
        no_wm = last_wm is None and wm_ms == 0
        buf.sort()
        cut = 0
        while not no_wm and cut < len(buf) and buf[cut][0] < wm:
            cut += 1
        frozen, buf = buf[:cut], buf[cut:]
        anchor, emitted, acts = _fold_retention(
            anchor, emitted, frozen, anchor_type, offs
        )
        state.update(
            (
                anchor,
                sorted(emitted),
                [t for t, _ in buf],
                [ty for _, ty in buf],
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if acts:
            yield _rows(key, acts)

    keyed = events.select(
        F.col(user_col),
        F.col(time_col).alias("__event_ts"),
        F.unix_timestamp(F.col(time_col)).alias("__t"),
        F.col(type_col).cast("string").alias("__ty"),
    ).withWatermark("__event_ts", watermark_delay)
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
