"""ClickHouse ``sequenceMatch`` / ``sequenceCount`` re-expressed as
Spark plans.

The reference engine leaves event-sequence analytics to ClickHouse's
parametric aggregates (public semantics: ClickHouse docs,
parametric-functions — ``sequenceMatch('(?1)(?t<=3600)(?2)')``).
This module covers the common pattern subset — an ordered chain of
conditions, each gap optionally bounded by a max time delta, other
events freely interleaved — which is every ``(?1)(?t<=N)(?2)...``
pattern without ``(?t>N)`` lower bounds.

``sequence_match`` is pure window functions (codegen, one Exchange on
the user key): for per-gap upper bounds, the LATEST completion time of
step k is always an optimal chain prefix (a later completion can only
relax the next gap), so exists-a-chain reduces to a running-max DP —
the same argument as :mod:`.events_analytics.window_funnel`, tracking
step-completion time instead of chain start.

``sequence_count`` (non-overlapping match count) is inherently
sequential per user — after a chain completes, matching restarts after
its last event, a data-dependent reset no fixed stack of window
functions expresses — so it runs as one Arrow ``applyInPandas`` pass
per user group: state is O(len(conditions)) per user, groups are
hash-partitioned, nothing collects to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _conds(conditions: Sequence[Column | str]) -> list[Column]:
    if len(conditions) < 1:
        raise ValueError("conditions must contain at least one expression")
    return [F.expr(c) if isinstance(c, str) else c for c in conditions]


def _gaps(
    max_gaps: Sequence[int | float | None] | None, n: int
) -> list[int | float | None]:
    gaps = list(max_gaps) if max_gaps is not None else [None] * (n - 1)
    if len(gaps) != n - 1:
        raise ValueError(
            f"max_gaps must have len(conditions)-1 = {n - 1} entries, "
            f"got {len(gaps)}"
        )
    return gaps


def sequence_match(
    events: DataFrame,
    conditions: Sequence[Column | str],
    max_gaps: Sequence[int | float | None] | None = None,
    time_col: str = "time",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
    min_gaps: Sequence[int | float | None] | None = None,
) -> DataFrame:
    """Per-user flag: does SOME subsequence of the user's events, in
    strictly increasing ``(time_col, tiebreak_col)`` row order, satisfy
    ``conditions[0] .. conditions[n-1]`` with each consecutive gap
    ``t_{k+1} - t_k <= max_gaps[k]`` (``None`` = unbounded) and
    ``t_{k+1} - t_k > min_gaps[k]`` (strict, ``None`` = none)?

    ClickHouse ``sequenceMatch('(?1)(?t<=g1)(?2)...')`` semantics;
    ``min_gaps`` covers the ``(?t>N)`` lower-bound form. Conditions
    are arbitrary boolean expressions over the event row (strings
    parse via ``F.expr``), so a row may satisfy several steps —
    chains still use one ROW per step (strictly increasing row
    order), matching ClickHouse.

    Returns ``(user_col, matched int)`` — one row per user with any
    event. With only upper bounds this is one Exchange on
    ``user_col``, all step passes sharing its sort in whole-stage
    codegen (latest-completion running-max DP). A lower-bounded gap
    breaks that DP — min gaps prefer EARLY completions, max gaps
    prefer LATE, and with both no single representative completion is
    universally optimal — so those patterns run the candidate-list
    fold of :func:`_sequence_match_general` (same one-Exchange
    sorted-partition Arrow shape as :func:`sequence_count`).
    """
    conds = _conds(conditions)
    gaps = _gaps(max_gaps, len(conds))
    lo = (
        _gaps(min_gaps, len(conds))
        if min_gaps is not None
        else [None] * (len(conds) - 1)
    )
    if any(g is not None for g in lo):
        return _sequence_match_general(
            events, conds, lo, gaps, time_col, user_col, tiebreak_col
        )
    order = [F.col(time_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(time_col)
    # __c{k}: completion time of step k AT this row (latest-completion
    # DP); __m{k}: best completion available to step k+1 — the running
    # max over strictly preceding rows.
    df = events.withColumn("__c1", F.when(conds[0], t))
    for k in range(2, len(conds) + 1):
        df = df.withColumn(f"__m{k - 1}", F.max(f"__c{k - 1}").over(prev))
        gate = conds[k - 1] & F.col(f"__m{k - 1}").isNotNull()
        g = gaps[k - 2]
        if g is not None:
            gate = gate & (t - F.col(f"__m{k - 1}") <= g)
        df = df.withColumn(f"__c{k}", F.when(gate, t))
    return df.groupBy(user_col).agg(
        F.max(
            F.when(F.col(f"__c{len(conds)}").isNotNull(), 1).otherwise(0)
        )
        .cast("int")
        .alias("matched")
    )


def _sequence_match_general(
    events: DataFrame,
    conds: list[Column],
    lo_gaps: list,
    hi_gaps: list,
    time_col: str,
    user_col: str,
    tiebreak_col: str | None,
    count: bool = False,
) -> DataFrame:
    """Exists-a-chain with per-gap [lo, hi] bounds (lo strict, hi
    inclusive): per user the fold keeps, for every step, the SORTED
    DISTINCT completion times still able to serve a future event —
    with mixed bounds no single completion is universally optimal, so
    the candidate set is the state (ClickHouse's backtracking matcher
    explores the same space). Two prunes bound it: a candidate whose
    outgoing max gap has expired (``p + hi < t``; times are
    nondecreasing, so no future event can use it) is dropped, and a
    step's feasibility check is O(1) — candidates surviving the prune
    all satisfy the upper bound, and the strict lower bound holds iff
    the EARLIEST candidate is old enough. With an unbounded outgoing
    gap the step's list can grow with the user's distinct completion
    times — the honest worst case, same as CH's event buffer.

    One Exchange (hash by user) + sorted-partition Arrow scan; state
    carries across Arrow batch boundaries. Descending step order per
    row keeps a row from chaining to itself (a step only chains to a
    strictly earlier ROW). Returns ``(user_col, matched int)`` — or,
    with ``count=True``, ``(user_col, n_matches long)``:
    non-overlapping earliest-end matching (count a match the first
    row the final step completes, consume everything at or before it
    by resetting the candidate state, continue). Earliest-end stays
    optimal with interval gap bounds by the usual exchange argument —
    replacing any match of an optimal solution with the
    earliest-ending one can only leave more rows for the rest."""
    import collections

    import pandas as pd
    from pyspark.sql import types as T

    n = len(conds)
    order_cols = [time_col] + ([tiebreak_col] if tiebreak_col else [])
    pre = (
        events.select(
            F.col(user_col).alias("__u"),
            *[F.col(c) for c in order_cols],
            *[
                c.cast("boolean").alias(f"__p{i}")
                for i, c in enumerate(conds)
            ],
        )
        .repartition(F.col("__u"))
        .sortWithinPartitions("__u", *order_cols)
    )
    u_type = pre.schema["__u"].dataType
    out_name = "n_matches" if count else "matched"
    schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField(
                out_name, T.LongType() if count else T.IntegerType()
            ),
        ]
    )

    def scan(batches):
        cur = None
        has_cur = False
        cand: list = [collections.deque() for _ in range(n)]
        matches = 0
        out_u: list = []
        out_m: list = []
        for pdf in batches:
            users = pdf["__u"].to_numpy()
            times = pdf[time_col].to_numpy()
            flags = [
                pdf[f"__p{i}"].fillna(False).to_numpy() for i in range(n)
            ]
            for j in range(len(pdf)):
                # NULL-safe run detection (r11): a NULL user is ONE
                # group (CH GROUP BY semantics); NaN != NaN would
                # start a fresh run on every NULL row
                u = users[j]
                if pd.isna(u):
                    u = None
                if not has_cur or u != cur:
                    if has_cur:
                        out_u.append(cur)
                        out_m.append(matches)
                    cur, has_cur = u, True
                    cand = [collections.deque() for _ in range(n)]
                    matches = 0
                if matches and not count:
                    continue  # exists-question: user already decided
                t = times[j]
                for k in range(n - 1, -1, -1):
                    if not flags[k][j]:
                        continue
                    if k > 0:
                        lo, hi = lo_gaps[k - 1], hi_gaps[k - 1]
                        prev = cand[k - 1]
                        if hi is not None:
                            # expired for every future event too
                            while prev and prev[0] + hi < t:
                                prev.popleft()
                        if not prev:
                            continue
                        # survivors satisfy the upper bound; the
                        # strict lower bound holds iff the earliest
                        # is old enough
                        if lo is not None and not prev[0] < t - lo:
                            continue
                    if k == n - 1:
                        matches += 1
                        if count:
                            # consume: everything at or before this
                            # match end is spent (non-overlapping)
                            cand = [
                                collections.deque() for _ in range(n)
                            ]
                        break
                    if not cand[k] or cand[k][-1] != t:
                        cand[k].append(t)
        if has_cur:
            out_u.append(cur)
            out_m.append(matches)
        if out_u:
            yield pd.DataFrame(
                {
                    user_col: out_u,
                    out_name: pd.array(
                        [
                            m if count else (1 if m else 0)
                            for m in out_m
                        ],
                        dtype="int64" if count else "int32",
                    ),
                }
            )

    return pre.mapInPandas(scan, schema)


def sequence_count(
    events: DataFrame,
    conditions: Sequence[Column | str],
    max_gaps: Sequence[int | float | None] | None = None,
    time_col: str = "time",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
    min_gaps: Sequence[int | float | None] | None = None,
) -> DataFrame:
    """Per-user count of NON-OVERLAPPING matches of the chain
    (ClickHouse ``sequenceCount`` semantics: find a match, continue
    searching strictly after its last event).

    The count is maximized by earliest-END matching: scan forward
    running the same latest-completion DP as :func:`sequence_match`
    (``best[k]`` = latest completion time of a chain prefix through
    step k, considering all unconsumed events so far); the FIRST event
    where step n completes is the earliest possible match end, so
    count it, discard all DP state (events at or before the match end
    are consumed), and continue. Tracking the full DP — not one
    committed chain cursor — is what keeps a dead partial chain (gap
    expired) from blocking a later viable chain that started mid-scan.

    Runs as ONE Arrow ``mapInPandas`` pass per partition over rows
    hash-partitioned by user and sorted ``(user, time[, tiebreak])``
    — the on-completion reset makes the recurrence data-dependent,
    which no fixed window-function stack expresses, but per-user
    pandas groups (one tiny DataFrame per user) would pay frame
    construction per key; the sorted-partition scan instead carries
    O(n_steps) fold state across user boundaries (and across the
    Arrow batches that may split a user) and emits one row per user.
    Condition columns are pre-evaluated JVM-side so Python sees only
    booleans and times. Returns ``(user_col, n_matches long)``.
    """
    import pandas as pd
    from pyspark.sql import types as T

    conds = _conds(conditions)
    gaps = _gaps(max_gaps, len(conds))
    if min_gaps is not None and any(
        g is not None for g in _gaps(min_gaps, len(conds))
    ):
        # lower-bounded gaps need the candidate-list fold (see
        # sequence_match); earliest-end consumption stays greedy-
        # optimal there too
        return _sequence_match_general(
            events, conds, _gaps(min_gaps, len(conds)), gaps,
            time_col, user_col, tiebreak_col, count=True,
        )
    n = len(conds)
    order_cols = [time_col] + ([tiebreak_col] if tiebreak_col else [])
    pre = (
        events.select(
            F.col(user_col).alias("__u"),
            *[F.col(c) for c in order_cols],
            *[
                c.cast("boolean").alias(f"__p{i}")
                for i, c in enumerate(conds)
            ],
        )
        .repartition(F.col("__u"))
        .sortWithinPartitions("__u", *order_cols)
    )
    u_type = pre.schema["__u"].dataType
    schema = T.StructType(
        [
            T.StructField(user_col, u_type),
            T.StructField("n_matches", T.LongType()),
        ]
    )

    def scan(batches):
        cur = None  # current user key
        has_cur = False
        best: list = [None] * (n + 1)  # best[k]: latest end of step-k prefix
        matches = 0
        out_u: list = []
        out_m: list = []
        for pdf in batches:
            users = pdf["__u"].to_numpy()
            times = pdf[time_col].to_numpy()
            flags = [
                pdf[f"__p{i}"].fillna(False).to_numpy() for i in range(n)
            ]
            for j in range(len(pdf)):
                # NULL-safe run detection (r11): a NULL user is ONE
                # group (CH GROUP BY semantics); NaN != NaN would
                # start a fresh run on every NULL row
                u = users[j]
                if pd.isna(u):
                    u = None
                if not has_cur or u != cur:
                    if has_cur:
                        out_u.append(cur)
                        out_m.append(matches)
                    cur, has_cur = u, True
                    best, matches = [None] * (n + 1), 0
                t = times[j]
                # descending k: step k may only chain to a completion
                # on a strictly earlier ROW, so this row's own updates
                # to best[k-1] must not feed best[k]
                for k in range(n, 0, -1):
                    if not flags[k - 1][j]:
                        continue
                    if k > 1:
                        p = best[k - 1]
                        g = gaps[k - 2]
                        if p is None or (g is not None and t - p > g):
                            continue
                    best[k] = t  # times nondecreasing: the new latest
                if best[n] is not None:
                    matches += 1
                    best = [None] * (n + 1)
        if has_cur:
            out_u.append(cur)
            out_m.append(matches)
        if out_u:
            yield pd.DataFrame({user_col: out_u, "n_matches": out_m})

    return pre.mapInPandas(scan, schema)


def sequence_next_node(
    events: DataFrame,
    steps: Sequence[str],
    direction: str = "forward",
    base: str = "head",
    time_col: str = "time",
    type_col: str = "event_type",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceNextNode(direction, base)(ts, event,
    base_cond, ev1...evN)`` (public semantics: CH parametric-functions
    reference, the experimental funnel family): per user, anchor at
    ``base`` on the timeline, check that the CONSECUTIVE run of
    events from the anchor in ``direction`` matches ``steps`` in
    order, and return the event-type one past the run — the "where do
    users go next" aggregate. Returns ``(user_col, next_event
    string)``, NULL when the run doesn't match or nothing lies past
    it.

    ``base`` picks the anchor on the TIMELINE — ``head`` (first
    event), ``tail`` (last), ``first_match``/``last_match``
    (first/last event matching ``steps[0]``); ``direction`` orients
    the run and the "next" independently (CH's canonical pairs are
    forward+head / backward+tail / forward+first_match /
    backward+last_match, but every combination is defined).

    Spark shape: one groupBy(user) building the per-user sorted event
    array (bounded by that user's activity — same envelope as any
    per-user analytic), then PURE array expressions: anchor search is
    one ``array_position``, the run check an element-wise indexed
    compare. No UDF, no second shuffle, and the whole thing is
    expressible in an oracle's list functions.
    """
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward' or 'backward'")
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(
            "base must be head / tail / first_match / last_match"
        )
    steps = [str(s) for s in steps]
    if not steps:
        raise ValueError("steps must name at least one event type")
    n = len(steps)
    step = 1 if direction == "forward" else -1
    order = [F.col(time_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    ev = F.struct(
        *[o.alias(f"_o{i}") for i, o in enumerate(order)],
        F.col(type_col).cast("string").alias("ty"),
    )
    # one ascending timeline array per user; sort_array orders by
    # struct fields left-to-right, so time (then tiebreak) decides
    grouped = events.groupBy(user_col).agg(
        F.sort_array(F.collect_list(ev)).alias("__a")
    )
    types = F.transform(F.col("__a"), lambda e: e["ty"])
    size = F.size(types)
    if base == "head":
        anchor = F.lit(1)
    elif base == "tail":
        anchor = size
    elif base == "first_match":
        anchor = F.array_position(types, steps[0])  # 0 = absent
    else:  # last_match: position of the final occurrence
        anchor = (
            size - F.array_position(F.reverse(types), steps[0]) + 1
        )

    def at(idx):
        # guard idx >= 1: Spark's negative element_at wraps from the
        # END of the array, which would silently alias indices
        return F.when(
            idx >= 1, F.try_element_at(types, idx.cast("int"))
        )

    ok = anchor > 0
    for i, s_i in enumerate(steps):
        ok = ok & (at(anchor + F.lit(i * step)) == F.lit(s_i))
    nxt = F.when(ok, at(anchor + F.lit(n * step)))
    return grouped.select(user_col, nxt.alias("next_event"))
