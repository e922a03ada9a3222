"""Streaming ``sequenceCount`` and ``sequenceMatch``: the ClickHouse
sequence matchers (operators/sequence_match.py) over a LIVE event
stream, with watermark-correct out-of-order handling.

Same construction as :mod:`.funnel` and :mod:`.rates`: counting a
match consumes events, and a consumed prefix cannot be un-consumed
when an earlier event arrives late — so events buffer in the state
store until the query watermark freezes them (strictly below the
watermark; an event at exactly ``t == watermark`` may still arrive),
then the frozen prefix folds in exact time order through the same
candidate-list earliest-end matcher the batch operator runs.

Scale shape: state per user is the per-step candidate lists (bounded
by each step's outgoing max gap — unbounded only when a gap has no
upper bound, the batch operator's documented worst case too) plus the
out-of-order buffer bounded by (watermark delay x event rate); events
shuffle once on the user key. Output is an update-mode running count
``(user, n_matches, ver)`` emitted whenever a batch completes new
matches for the user.

Parity with the batch operator (same steps/gaps on identical replayed
data) is asserted in tests.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _fold_count(cand, matches, events, types, lo_gaps, hi_gaps):
    """Fold time-ordered ``(t, type)`` events through the candidate-
    list earliest-end matcher (the count mode of
    ``operators.sequence_match._sequence_match_general``): ``cand`` is
    one sorted candidate-time list per step; a completed final step
    increments ``matches`` and consumes all state. Returns
    ``(cand, matches)``."""
    n = len(types)
    step_idx: dict = {}
    for i, s in enumerate(types):
        step_idx.setdefault(s, []).append(i)
    for t, ty in events:
        kis = step_idx.get(ty)
        if kis is None:
            continue
        for k in sorted(kis, reverse=True):
            if k > 0:
                lo = lo_gaps[k - 1] if lo_gaps else None
                hi = hi_gaps[k - 1] if hi_gaps else None
                prev = cand[k - 1]
                if hi is not None:
                    while prev and prev[0] + hi < t:
                        prev.pop(0)
                if not prev:
                    continue
                if lo is not None and not prev[0] < t - lo:
                    continue
            if k == n - 1:
                matches += 1
                cand = [[] for _ in range(n)]
                break
            if not cand[k] or cand[k][-1] != t:
                cand[k].append(t)
    return cand, matches


def streaming_sequence_count(
    events: DataFrame,
    types: Sequence[str],
    max_gaps: Sequence[int | float | None] | None = None,
    min_gaps: Sequence[int | float | None] | None = None,
    time_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Per-user running count of NON-OVERLAPPING matches of the typed
    step chain over a STREAMING events frame (``time_col`` =
    event-time TIMESTAMP). Gap bounds as in the batch operator:
    ``max_gaps[k]`` inclusive upper, ``min_gaps[k]`` strict lower
    (the ``(?t>N)`` form). Returns an update-mode stream
    ``(user_col, n_matches long, ver long)``.

    ``state_ttl_seconds`` evicts idle users (processing-time
    timeout); eviction folds ALL still-buffered events (frozen or
    not) and emits the final count before forgetting the user, so no
    observed event is silently dropped — a returning user then
    restarts at 0, the stated cold-key trade-off shared with the
    other stateful operators."""
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    n = len(types)
    if n < 1:
        raise ValueError("types must name at least one step")
    types = [str(s) for s in types]

    def _bounds(g):
        if g is None:
            return [None] * (n - 1)
        g = list(g)
        if len(g) != n - 1:
            raise ValueError(
                f"gap bounds need len(types)-1 = {n - 1} entries"
            )
        return g

    lo_gaps, hi_gaps = _bounds(min_gaps), _bounds(max_gaps)
    u_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("n_matches", T.LongType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField(
                "cand", T.ArrayType(T.ArrayType(T.LongType()))
            ),
            T.StructField("matches", T.LongType()),
            T.StructField("ver", T.LongType()),
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
            # fold EVERYTHING still buffered (frozen or not) before
            # forgetting the user — eviction must not silently drop
            # observed events
            cand_raw, matches, ver, buf_t, buf_ty, _ = state.get
            cand = [list(c or []) for c in (cand_raw or [])]
            if len(cand) != n:
                cand = [[] for _ in range(n)]
            buf = sorted(
                (int(t), str(ty))
                for t, ty in zip(buf_t or [], buf_ty or [])
            )
            before = int(matches or 0)
            _, total = _fold_count(
                cand, before, buf, types, lo_gaps, hi_gaps
            )
            state.remove()
            if total > before:
                yield pd.DataFrame(
                    {
                        user_col: [key[0]],
                        "n_matches": [total],
                        "ver": [int(ver or 0) + 1],
                    }
                )
            return
        if state.exists:
            cand_raw, matches, ver, buf_t, buf_ty, last_wm = state.get
            cand = [list(c or []) for c in (cand_raw or [])]
            if len(cand) != n:
                cand = [[] for _ in range(n)]
            matches, ver = int(matches or 0), int(ver or 0)
            buf = list(
                zip([int(t) for t in buf_t or []], buf_ty or [])
            )
            last_wm = None if last_wm is None else int(last_wm)
        else:
            cand, matches, ver = [[] for _ in range(n)], 0, 0
            buf, last_wm = [], None
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
        before = matches
        cand, matches = _fold_count(
            cand, matches, frozen, types, lo_gaps, hi_gaps
        )
        if matches > before:
            ver += 1
        state.update(
            (
                [list(c) for c in cand],
                matches,
                ver,
                [t for t, _ in buf],
                [ty for _, ty in buf],
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if matches > before:
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "n_matches": [matches],
                    "ver": [ver],
                }
            )

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
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_sequence_match(
    events: DataFrame,
    types: Sequence[str],
    max_gaps: Sequence[int | float | None] | None = None,
    min_gaps: Sequence[int | float | None] | None = None,
    time_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Per-user ``sequenceMatch`` (the EXISTS question: did the typed
    step chain ever complete?) over a STREAMING events frame — the
    pattern-match sibling of :func:`streaming_sequence_count`, sharing
    its watermark-buffered candidate fold; semantics mirror the batch
    ``operators.sequence_match.sequence_match`` (``(?1)(?t<=N)(?2)``
    chains plus ``(?t>N)`` strict lower bounds; a user's answer equals
    ``sequence_count > 0``, the identity the replay-parity test pins).

    Returns an update-mode stream ``(user_col, matched int, ver
    long)``: exactly ONE row per user, emitted the first batch whose
    frozen prefix completes the chain (the answer is monotone — once
    1, always 1). After that the user's state collapses to a single
    terminal flag: no buffering, no candidate lists, O(1) per matched
    user until TTL eviction (``state_ttl_seconds``, processing-time).
    Eviction of an UNMATCHED user folds everything still buffered
    first — frozen or not — and emits if that completes the chain, so
    no observed event is silently dropped; a returning user restarts
    unmatched, the cold-key trade-off shared with the other stateful
    operators.

    Scale shape: one shuffle on the user key; per-user state is the
    candidate lists (bounded by each step's outgoing max gap) plus the
    out-of-order buffer bounded by (watermark delay x event rate), and
    drops to one boolean the moment the user matches — on a stream
    where most users eventually match, state is asymptotically one
    flag per user."""
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    n = len(types)
    if n < 1:
        raise ValueError("types must name at least one step")
    types = [str(s) for s in types]

    def _bounds(g):
        if g is None:
            return [None] * (n - 1)
        g = list(g)
        if len(g) != n - 1:
            raise ValueError(
                f"gap bounds need len(types)-1 = {n - 1} entries"
            )
        return g

    lo_gaps, hi_gaps = _bounds(min_gaps), _bounds(max_gaps)
    u_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("matched", T.IntegerType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    # same layout as the count operator: `matches` doubles as the
    # terminal matched flag (0/1), so the state-store schema stays
    # shared-shape across the sequence family
    state_schema = T.StructType(
        [
            T.StructField(
                "cand", T.ArrayType(T.ArrayType(T.LongType()))
            ),
            T.StructField("matched", T.LongType()),
            T.StructField("ver", T.LongType()),
            T.StructField("buf_t", T.ArrayType(T.LongType())),
            T.StructField("buf_ty", T.ArrayType(T.StringType())),
            T.StructField("last_wm", T.LongType()),
        ]
    )

    def _emit(key, ver):
        return pd.DataFrame(
            {user_col: [key[0]], "matched": [1], "ver": [ver]}
        )

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            cand_raw, matched, ver, buf_t, buf_ty, _ = state.get
            state.remove()
            if int(matched or 0):
                return  # already emitted when it first matched
            # fold EVERYTHING still buffered before forgetting
            cand = [list(c or []) for c in (cand_raw or [])]
            if len(cand) != n:
                cand = [[] for _ in range(n)]
            buf = sorted(
                (int(t), str(ty))
                for t, ty in zip(buf_t or [], buf_ty or [])
            )
            _, total = _fold_count(cand, 0, buf, types, lo_gaps, hi_gaps)
            if total:
                yield _emit(key, int(ver or 0) + 1)
            return
        if state.exists:
            cand_raw, matched, ver, buf_t, buf_ty, last_wm = state.get
            if int(matched or 0):
                # terminal: keep the flag, ignore further events
                state.update(([[]] * n, 1, int(ver or 0), [], [], last_wm))
                if state_ttl_seconds:
                    state.setTimeoutDuration(state_ttl_seconds * 1000)
                return
            cand = [list(c or []) for c in (cand_raw or [])]
            if len(cand) != n:
                cand = [[] for _ in range(n)]
            ver = int(ver or 0)
            buf = list(
                zip([int(t) for t in buf_t or []], buf_ty or [])
            )
            last_wm = None if last_wm is None else int(last_wm)
        else:
            cand, ver, buf, last_wm = [[] for _ in range(n)], 0, [], None
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
        cand, got = _fold_count(cand, 0, frozen, types, lo_gaps, hi_gaps)
        if got:
            # terminal flag: drop buffers and candidates for good
            ver += 1
            state.update(([[]] * n, 1, ver, [], [], None if no_wm else int(wm)))
            if state_ttl_seconds:
                state.setTimeoutDuration(state_ttl_seconds * 1000)
            yield _emit(key, ver)
            return
        state.update(
            (
                [list(c) for c in cand],
                0,
                ver,
                [t for t, _ in buf],
                [ty for _, ty in buf],
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)

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
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_sequence_next_node(
    events: DataFrame,
    steps: Sequence[str],
    time_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark_delay: str = "30 seconds",
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming ``sequenceNextNode('forward', 'head')`` — "where do
    users go next": per user, once the FIRST ``len(steps)+1`` events
    (in event-time order) are frozen below the watermark, check the
    consecutive head run against ``steps`` and emit the event one past
    it (operators/sequence_match.sequence_next_node is the batch
    twin; CH parametric-functions reference for the semantics).

    head+forward is the one base/direction pair with streaming
    meaning: the answer depends only on the stream's PREFIX, so it
    determines monotonically — a mismatch anywhere in the head run
    decides NULL immediately, a full run decides on the (n+1)-th
    frozen event, and either way the user's state collapses to a
    terminal flag (tail/last_match anchor on the END of the stream
    and stay batch-only). Returns an update-mode
    ``(user_col, next_event string, ver long)`` — exactly one row per
    DETERMINED user; ``next_event`` NULL when the head run mismatched
    (the batch operator's NULL). An undetermined user (matched run,
    no next event frozen yet) emits nothing until more data — or
    until ``state_ttl_seconds`` evicts them, which folds the
    still-buffered tail and emits the batch-equivalent answer for the
    events actually observed.

    State per undetermined user: the (watermark delay x rate)
    out-of-order buffer, a consumed-count, and an ok flag — the
    frozen prefix itself is never retained. One shuffle on the user
    key."""
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    n = len(steps)
    if n < 1:
        raise ValueError("steps must name at least one event type")
    steps = [str(s) for s in steps]
    u_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("next_event", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("seen", T.LongType()),   # frozen events consumed
            T.StructField("done", T.LongType()),   # 0/1 terminal
            T.StructField("ver", T.LongType()),
            T.StructField("buf_t", T.ArrayType(T.LongType())),
            T.StructField("buf_ty", T.ArrayType(T.StringType())),
            T.StructField("last_wm", T.LongType()),
        ]
    )

    def _consume(seen, frozen):
        """Fold frozen (t, ty) events in order through the head-run
        check. Returns (seen', decided, next_event)."""
        for _, ty in frozen:
            if seen < n:
                if ty != steps[seen]:
                    return seen, True, None  # head run broken: NULL
                seen += 1
            else:
                return seen, True, ty  # the one-past-the-run event
        return seen, False, None

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            seen, done, ver, buf_t, buf_ty, _ = state.get
            state.remove()
            if int(done or 0):
                return
            buf = sorted(
                (int(t), str(ty))
                for t, ty in zip(buf_t or [], buf_ty or [])
            )
            _, decided, nxt = _consume(int(seen or 0), buf)
            # stream over for this user: an unmatched run or a matched
            # run with nothing past it is the batch NULL either way
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "next_event": [nxt],
                    "ver": [int(ver or 0) + 1],
                }
            )
            return
        if state.exists:
            seen, done, ver, buf_t, buf_ty, last_wm = state.get
            if int(done or 0):
                state.update((seen, 1, ver, [], [], last_wm))
                if state_ttl_seconds:
                    state.setTimeoutDuration(state_ttl_seconds * 1000)
                return
            seen, ver = int(seen or 0), int(ver or 0)
            buf = list(
                zip([int(t) for t in buf_t or []], buf_ty or [])
            )
            last_wm = None if last_wm is None else int(last_wm)
        else:
            seen, ver, buf, last_wm = 0, 0, [], None
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
        seen, decided, nxt = _consume(seen, frozen)
        if decided:
            ver += 1
            state.update(
                (seen, 1, ver, [], [], None if no_wm else int(wm))
            )
            if state_ttl_seconds:
                state.setTimeoutDuration(state_ttl_seconds * 1000)
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "next_event": [nxt],
                    "ver": [ver],
                }
            )
            return
        state.update(
            (
                seen,
                0,
                ver,
                [t for t, _ in buf],
                [ty for _, ty in buf],
                None if no_wm else int(wm),
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)

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
        outputMode="update",
        timeoutConf=timeout,
    )
