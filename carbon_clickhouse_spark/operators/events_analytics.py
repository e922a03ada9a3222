"""ClickHouse-style event analytics re-expressed as Spark window ops.

The reference engine stores into ClickHouse and leaves analytics to
ClickHouse's function library; ``windowFunnel`` and ``retention`` are
that library's signature event-sequence aggregates (public semantics:
ClickHouse docs, parametric-functions). This module provides the same
capabilities as pure DataFrame plans — one Exchange on the user key,
window functions inside whole-stage codegen, no Python in the loop.

windowFunnel here is the running-max DP: for a chain reaching step k,
a LATER chain start time is always at least as good (it can only relax
the window constraint for deeper steps), so the exists-a-chain
semantics reduce to, per event, the running maximum over strictly
preceding rows of the best chain-start reaching the previous step.
That is exactly N window functions over one partitioning+sort — no
per-user UDF, no self-joins, no state store.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


#: ClickHouse windowFunnel modes (parametric-functions reference)
FUNNEL_MODES = frozenset(
    {"strict_increase", "strict_order", "strict_deduplication",
     "strict_once"}
)


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window: int,
    time_col: str = "time",
    type_col: str = "event_type",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
    modes: Sequence[str] = (),
) -> DataFrame:
    """Per-user maximum funnel depth: the largest ``k`` such that some
    events of types ``steps[0..k-1]`` occur in strictly increasing row
    order with ``t_k - t_1 <= window`` (same units as ``time_col``,
    which must be numeric — epoch seconds/micros).

    Returns ``(user_col, funnel_level int)`` with one row per user
    that has ANY event (level 0 = none of ``steps[0]`` seen).

    Semantics match ClickHouse ``windowFunnel(window[, mode])(t,
    cond1, ...)`` with deterministic ordering: events are ordered by
    ``(time_col, tiebreak_col)`` and a step may only chain to an event
    on an earlier row, so equal-timestamp chains resolve by the
    tiebreak rather than engine-dependent input order. All four
    documented modes are supported, combinable:

    - ``strict_increase``: a step chains only to a previous step whose
      event time is STRICTLY smaller.
    - ``strict_order``: once the funnel has started, an event matching
      no step — or a step whose predecessor is unmatched — stops the
      search at the depth reached.
    - ``strict_deduplication``: an event re-matching an
      already-matched step (other than step 1, whose re-match restarts
      the chain) stops the search. The level reported is the deepest
      step reached at interruption — the documented intent; the CH
      C++ quirk of reporting the *previous entry's* condition index
      instead is deliberately not replicated.
    - ``strict_once``: one event never advances two steps of the SAME
      chain (relevant when the step list repeats a type); chains
      through distinct events still form.

    Scale shape (default / ``strict_increase``): one Exchange on
    ``user_col``; all ``len(steps)`` window passes share that
    partitioning and sort, so Catalyst plans a single shuffle + sort
    with chained Window operators, each in codegen. Cost is O(events)
    rows shuffled once — no join, no explode, no per-user collect.
    The interrupt modes (``strict_order`` / ``strict_deduplication``
    / ``strict_once``) are inherently sequential (processing stops at
    a data-dependent event), so they run as the same
    sorted-partition Arrow scan as
    :func:`.sequence_match.sequence_count`: one Exchange on the user
    key, O(n_steps) fold state carried across batch boundaries,
    booleans pre-evaluated JVM-side. A step list that REPEATS a type
    also takes the sequential path in every mode (see the dispatch
    comment below — CH's ascending entry expansion is not expressible
    in the strictly-preceding-rows DP).
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    mset = {str(m) for m in modes}
    bad = mset - FUNNEL_MODES
    if bad:
        raise ValueError(
            f"unknown windowFunnel mode(s) {sorted(bad)}; "
            f"supported: {sorted(FUNNEL_MODES)}"
        )
    needs_seq = bool(
        mset & {"strict_order", "strict_deduplication", "strict_once"}
    )
    if not needs_seq and len(set(steps)) < len(steps):
        # a repeated-type step list breaks the window DP either way:
        # CH's ascending entry expansion lets ONE event advance
        # several repeated steps of the same chain (default mode),
        # and even under strict_increase — where the self-chain fails
        # its own tev < t test — a step-1 re-match overwrites the
        # chain start BEFORE the same event's later entries read it.
        # The DP reads only strictly-preceding rows, so it can
        # express neither; run the sequential fold instead.
        needs_seq = True
    if needs_seq:
        return _funnel_sequential(
            events, steps, window, time_col, type_col, user_col,
            tiebreak_col, mset,
        )
    strict_increase = "strict_increase" in mset
    order = [F.col(time_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(
        user_col, time_col, type_col, *([tiebreak_col] if tiebreak_col else [])
    )
    t = F.col(time_col)
    # __s{k}: the best (latest) chain start among chains that reach
    # step k AT this event; __m{k}: running max of __s{k} over strictly
    # preceding rows, i.e. the best start available to the next step.
    # For strict_increase, __e{k} is the running max of step-k EVENT
    # times: both maxes are non-decreasing write sequences, so the
    # pair (max start, max event time) is exactly the latest write —
    # the single slot the CH sequential fold keeps.
    df = df.withColumn(
        "__s1", F.when(F.col(type_col) == steps[0], t)
    )
    for k in range(2, len(steps) + 1):
        df = df.withColumn(f"__m{k - 1}", F.max(f"__s{k - 1}").over(prev))
        chain = (F.col(type_col) == steps[k - 1]) & (
            t - F.col(f"__m{k - 1}") <= window
        )
        if strict_increase:
            df = df.withColumn(
                f"__e{k - 1}",
                F.max(
                    F.when(F.col(f"__s{k - 1}").isNotNull(), t)
                ).over(prev),
            )
            chain = chain & (t > F.col(f"__e{k - 1}"))
        df = df.withColumn(
            f"__s{k}", F.when(chain, F.col(f"__m{k - 1}"))
        )
    level = F.lit(0)
    for k in range(1, len(steps) + 1):
        level = F.when(F.col(f"__s{k}").isNotNull(), k).otherwise(level)
    return (
        df.withColumn("__lvl", level)
        .groupBy(user_col)
        .agg(F.max("__lvl").cast("int").alias("funnel_level"))
    )


def _funnel_sequential(
    events: DataFrame,
    steps: Sequence[str],
    window: int,
    time_col: str,
    type_col: str,
    user_col: str,
    tiebreak_col: str | None,
    mset: set,
) -> DataFrame:
    """The CH single-slot fold for the interrupt modes, as a
    sorted-partition Arrow scan (shape notes in
    :func:`window_funnel`). Each event expands to one entry per
    matching step index, ascending — the CH entry expansion for a
    step list that repeats a type."""
    import pandas as pd
    from pyspark.sql import types as T

    n = len(steps)
    steps = [str(s) for s in steps]
    s_inc = "strict_increase" in mset
    s_ord = "strict_order" in mset
    s_dedup = "strict_deduplication" in mset
    s_once = "strict_once" in mset
    order_cols = [time_col] + ([tiebreak_col] if tiebreak_col else [])
    pre = (
        events.select(
            F.col(user_col).alias("__u"),
            *[F.col(c) for c in order_cols],
            F.col(type_col).cast("string").alias("__ty"),
        )
        .repartition(F.col("__u"))
        .sortWithinPartitions("__u", *order_cols)
    )
    u_type = pre.schema["__u"].dataType
    schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("funnel_level", T.IntegerType()),
        ]
    )
    step_idx: dict = {}
    for i, s in enumerate(steps):
        step_idx.setdefault(s, []).append(i)

    def scan(batches):
        cur = None
        has_cur = False
        slots: list = [None] * n  # slot[i] = (chain start, event time)
        started = stopped = False
        out_u: list = []
        out_l: list = []

        def flush():
            lvl = 0
            for i in range(n, 0, -1):
                if slots[i - 1] is not None:
                    lvl = i
                    break
            out_u.append(cur)
            out_l.append(lvl)

        for pdf in batches:
            users = pdf["__u"].to_numpy()
            times = pdf[time_col].to_numpy()
            types = pdf["__ty"].to_numpy()
            for j in range(len(pdf)):
                # NULL-safe run detection (r11): a NULL user is ONE
                # group (CH GROUP BY semantics); NaN != NaN would
                # start a fresh run on every NULL row
                u = users[j]
                if pd.isna(u):
                    u = None
                if not has_cur or u != cur:
                    if has_cur:
                        flush()
                    cur, has_cur = u, True
                    slots = [None] * n
                    started = stopped = False
                if stopped:
                    continue
                t = times[j]
                cis = step_idx.get(types[j])
                if cis is None:
                    if s_ord and started:
                        stopped = True
                    continue
                # strict_once: descending step order means a slot this
                # event writes is never the predecessor of a slot this
                # same event fills — one event can't appear twice in
                # one chain, while chains through DISTINCT events
                # still form (CH strict_once semantics)
                for ci in (reversed(cis) if s_once else cis):
                    if ci == 0:
                        slots[0] = (t, t)
                        started = True
                        continue
                    if s_dedup and slots[ci] is not None:
                        stopped = True
                        break
                    if s_ord and started and slots[ci - 1] is None:
                        stopped = True
                        break
                    p = slots[ci - 1]
                    if p is None:
                        continue
                    start, tev = p
                    if t - start > window:
                        continue
                    if s_inc and not tev < t:
                        continue
                    slots[ci] = (start, t)
        if has_cur:
            flush()
        if out_u:
            yield pd.DataFrame(
                {
                    user_col: out_u,
                    "funnel_level": pd.array(out_l, dtype="int32"),
                }
            )

    return pre.mapInPandas(scan, schema)


def retention_cohorts(
    events: DataFrame,
    anchor_type: str,
    offsets: Sequence[int] = (0, 1, 3, 7, 14),
    date_col: str = "date",
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention (ClickHouse ``retention(cond0, cond1, ...)``
    rolled up by cohort): anchor each user on the DATE of their first
    ``anchor_type`` event; for each requested day offset, count how
    many cohort members had any event exactly that many days later.

    Returns ``(cohort date, day_offset int, n_active long)`` — one row
    per (cohort, offset) with at least one active user; offset 0 is
    the cohort size (the anchor day itself counts as activity).

    Scale shape: the anchor table is one groupBy(user) min-date; the
    activity table is distinct (user, date); their equi-join shuffles
    on the user key (both sides large — a broadcast would be wrong at
    corpus scale, so none is hinted), then one groupBy on the tiny
    (cohort, offset) key with partial aggregation.
    """
    anchors = (
        events.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.min(date_col).alias("__cohort"))
    )
    activity = events.select(user_col, F.col(date_col).alias("__d")).distinct()
    offs = [int(o) for o in offsets]
    joined = anchors.join(activity, user_col).withColumn(
        "__off", F.datediff(F.col("__d"), F.col("__cohort"))
    )
    return (
        joined.filter(F.col("__off").isin(offs))
        .groupBy(F.col("__cohort").alias("cohort"), F.col("__off").cast("int").alias("day_offset"))
        .agg(F.countDistinct(user_col).alias("n_active"))
    )


def retention_flags(
    events: DataFrame,
    conditions,
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(cond1, ..., condN)`` in its raw form
    (public semantics: CH parametric-functions reference): per user,
    ``r1 = cond1 held on some event`` and ``ri = cond1 AND condi``
    (every later flag is gated on the first — the anchor condition).
    Returns ``(user_col, r1 int, ..., rN int)`` — the columnar
    equivalent of CH's UInt8 array, ready for the standard
    ``sum(ri)/sum(r1)`` ratio rollup. :func:`retention_cohorts` is the
    cohort-date flavor; this is the condition-set flavor.

    One partial-aggregating groupBy over pre-evaluated boolean
    columns: conditions are Spark expressions (strings or Columns),
    so "active on day X" or "event_type = 'purchase'" both work.
    Scale shape: single Exchange on the user key, max() combiners
    map-side, no join.
    """
    from .sequence_match import _conds

    conds = _conds(conditions)
    flags = [
        F.max(F.when(c, 1).otherwise(0)).alias(f"__c{i}")
        for i, c in enumerate(conds)
    ]
    agg = events.groupBy(user_col).agg(*flags)
    out = [F.col("__c0").cast("int").alias("r1")]
    for i in range(1, len(conds)):
        out.append(
            (F.col("__c0") * F.col(f"__c{i}")).cast("int").alias(f"r{i + 1}")
        )
    return agg.select(user_col, *out)


def delta_sum(
    events: DataFrame,
    group_cols,
    value_col: str = "value",
    time_col: str = "time",
    tiebreak_col: str | None = None,
    timestamped: bool = False,
) -> DataFrame:
    """ClickHouse ``deltaSum(value)`` / ``deltaSumTimestamp(value,
    ts)`` (public semantics: CH aggregate-functions reference): per
    group, the sum of POSITIVE differences between consecutive values
    in time order — the standard monotonic-counter rate primitive
    (counter resets contribute nothing instead of huge negatives).
    Returns ``(*group_cols, delta_sum double)``.

    ``timestamped=True`` is the ``deltaSumTimestamp`` contract: order
    by the timestamp column (exactly what this implementation always
    does — the flag exists to document that CH's plain ``deltaSum``
    depends on storage order, which a distributed scan cannot honor;
    the time-ordered form is the deterministic one, so it is the only
    form offered and the parameter is accepted for API parity).

    Scale shape: one Exchange on the group key; the lag window and
    conditional sum share the partitioning/sort and stay in codegen.
    """
    del timestamped  # both CH spellings map to the time-ordered form
    gcols = list(group_cols)
    order = [F.col(time_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*gcols).orderBy(*order)
    v = F.col("__v")
    d = v - F.lag(v).over(w)
    return (
        events.select(
            *gcols, *order, F.col(value_col).cast("double").alias("__v")
        )
        .withColumn(
            "__d",
            F.when(
                d.isNotNull() & (d > 0), d
            ).otherwise(F.lit(0.0)),
        )
        .groupBy(*gcols)
        .agg(F.sum("__d").alias("delta_sum"))
    )
