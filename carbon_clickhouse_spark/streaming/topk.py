"""Streaming ``topK``: live heavy-hitters per group over an unbounded
stream — the ClickHouse pattern of a materialized view maintaining
``topKState`` (public semantics: CH aggregate-function reference;
algorithm: SpaceSaving, Metwally et al. 2005, same as the batch
:func:`..operators.ch_aggregates.top_k_sketch`).

Scale shape: the state store is partitioned by the group key, so each
group's summary is a SINGLE sequential SpaceSaving instance — no
cross-partition merge is ever needed (that is the streaming
advantage over the batch sketch, whose per-partition summaries must
merge with widened bounds). State per group is exactly ``slots``
(value, count, err) triples regardless of how many distinct values
ever arrive; rows shuffle once into the state store and nothing is
global. The single-instance guarantee holds at any stream length:
``cnt_upper - err <= true count <= cnt_upper``, and any value with
true frequency > n/slots is present in the summary.

Output is an update-mode snapshot: each micro-batch in which a group
receives rows emits that group's refreshed top-k (<= k rows), stamped
with a per-group monotonically increasing ``ver`` so downstream
consumers (and tests) can select the latest snapshot without relying
on sink ordering.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 10,
    oversample: int = 4,
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Maintain per-group SpaceSaving summaries (``k * oversample``
    slots) in the state store and emit update-mode top-k snapshots
    ``(*group_cols, value, cnt_lower, cnt_upper, rnk, n, ver)``.

    ``n`` is the group's total non-null rows folded so far (the
    denominator of the frequency guarantee); ``ver`` increments once
    per emitting batch. NULL values are skipped (ClickHouse
    aggregate-function semantics). ``state_ttl_seconds`` evicts idle
    groups (processing-time timeout) to bound the store on high-churn
    keys; eviction forgets counts, matching a cold-key cache.
    """
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    try:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )
    except ImportError:  # pragma: no cover - pyspark always ships it
        from pyspark.sql.streaming import GroupState, GroupStateTimeout

    import pandas as pd

    slots = k * oversample
    gcols = list(group_cols)
    gfields = [df.schema[c] for c in gcols]
    out_schema = T.StructType(
        gfields
        + [
            T.StructField("value", T.StringType()),
            T.StructField("cnt_lower", T.LongType()),
            T.StructField("cnt_upper", T.LongType()),
            T.StructField("rnk", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("vals", T.ArrayType(T.StringType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("errs", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
            T.StructField("ver", T.LongType()),
        ]
    )

    def fn(
        key: Any,
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            # idle-group eviction: the last emitted snapshot already
            # reflects every folded row, so there is nothing to flush
            state.remove()
            return
        if state.exists:
            vals, cnts, errs, n, ver = state.get
            s = {
                v: (int(c), int(e))
                for v, c, e in zip(vals or [], cnts or [], errs or [])
            }
            n, ver = int(n or 0), int(ver or 0)
        else:
            s, n, ver = {}, 0, 0
        folded = 0
        for pdf in pdfs:
            col = pdf["__v"]
            for v in col:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                folded += 1
                if v in s:
                    c, e = s[v]
                    s[v] = (c + 1, e)
                elif len(s) < slots:
                    s[v] = (1, 0)
                else:
                    # evict the minimum; the newcomer inherits its
                    # count as the overestimation bound (SpaceSaving)
                    mv = min(s, key=lambda x: s[x][0])
                    mc, _ = s.pop(mv)
                    s[v] = (mc + 1, mc)
        if not folded:
            # watermark-only invocation: no change, no snapshot
            if state.exists and state_ttl_seconds:
                state.setTimeoutDuration(state_ttl_seconds * 1000)
            return
        n += folded
        ver += 1
        items = sorted(s.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [v for v, _ in items],
                [c for _, (c, _) in items],
                [e for _, (_, e) in items],
                n,
                ver,
            )
        )
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        top = items[:k]
        gvals = {c: [key[i]] * len(top) for i, c in enumerate(gcols)}
        yield pd.DataFrame(
            {
                **gvals,
                "value": [v for v, _ in top],
                "cnt_lower": [c - e for _, (c, e) in top],
                "cnt_upper": [c for _, (c, _) in top],
                "rnk": list(range(1, len(top) + 1)),
                "n": [n] * len(top),
                "ver": [ver] * len(top),
            }
        )

    keyed = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, F.col(value_col).cast("string").alias("__v")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(*gcols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
