"""ClickHouse-style event analytics (windowFunnel / retention) as
pure window-function plans — operators/events_analytics.py.

window_funnel is validated against an exhaustive chain search (the
definition, not the DP) on randomized fixtures, so the running-max
reformulation is proven equivalent, not just spot-checked.
"""

import random

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.events_analytics import (
    retention_cohorts,
    window_funnel,
)


def brute_funnel(rows, steps, window):
    """Maximum k such that events of types steps[0..k-1] occur on
    strictly increasing (time, event_id) rows with t_k - t_1 <=
    window — exhaustive search over all chains."""
    rows = sorted(rows)  # (time, event_id, type)
    n = len(rows)
    best = 0

    def ext(level, start_t, idx):
        nonlocal best
        best = max(best, level)
        if level == len(steps):
            return
        for j in range(idx, n):
            t, _, ty = rows[j]
            if ty == steps[level] and (level == 0 or t - start_t <= window):
                ext(level + 1, t if level == 0 else start_t, j + 1)

    ext(0, 0, 0)
    return best


def _run(spark, data, steps, window):
    df = spark.createDataFrame(
        data, "user_id long, time long, event_type string, event_id long"
    )
    out = window_funnel(
        df, steps, window, tiebreak_col="event_id"
    ).collect()
    return {r.user_id: r.funnel_level for r in out}


def test_funnel_basic_chain(spark):
    got = _run(
        spark,
        [
            (1, 10, "a", 1), (1, 20, "b", 2), (1, 25, "c", 3),
            # b before the window's a must not chain
            (2, 5, "b", 4), (2, 10, "a", 5), (2, 100, "b", 6),
            # never starts
            (3, 7, "b", 7), (3, 8, "c", 8),
        ],
        ["a", "b", "c"],
        50,
    )
    assert got == {1: 3, 2: 1, 3: 0}


def test_funnel_window_cutoff_is_from_chain_start(spark):
    # a@0, b@40, c@60: c is within 50 of b but not of a -> level 2;
    # a@30 restarts the chain, b@40/c@60 chain off it -> level 3
    assert _run(
        spark,
        [(1, 0, "a", 1), (1, 40, "b", 2), (1, 60, "c", 3)],
        ["a", "b", "c"],
        50,
    ) == {1: 2}
    assert _run(
        spark,
        [
            (1, 0, "a", 1), (1, 30, "a", 2),
            (1, 40, "b", 3), (1, 60, "c", 4),
        ],
        ["a", "b", "c"],
        50,
    ) == {1: 3}


def test_funnel_equal_timestamps_resolve_by_tiebreak(spark):
    # same second: event_id order decides; b(row after a) chains,
    # b(row before a) does not
    assert _run(
        spark, [(1, 10, "a", 1), (1, 10, "b", 2)], ["a", "b"], 50
    ) == {1: 2}
    assert _run(
        spark, [(1, 10, "b", 1), (1, 10, "a", 2)], ["a", "b"], 50
    ) == {1: 1}


def test_funnel_repeated_step_types(spark):
    # steps may repeat a type: in CH's default ascending fold one
    # event advances BOTH 'a' steps of the same chain (self-chain),
    # so even the single-event user reaches level 2; strict_once is
    # the mode that turns this off (test_funnel_modes covers it)
    assert _run(
        spark,
        [(1, 0, "a", 1), (1, 10, "a", 2), (2, 0, "a", 3)],
        ["a", "a"],
        50,
    ) == {1: 2, 2: 2}


def test_funnel_matches_exhaustive_search(spark):
    rng = random.Random(6)
    steps = ["s0", "s1", "s2", "s3"]
    data, expect = [], {}
    eid = 0
    for user in range(40):
        n = rng.randint(0, 12)
        rows = []
        for _ in range(n):
            eid += 1
            t = rng.randint(0, 120)
            ty = rng.choice(["s0", "s1", "s2", "s3", "x"])
            rows.append((t, eid, ty))
            data.append((user, t, ty, eid))
        if rows:
            expect[user] = brute_funnel(rows, steps, 60)
    got = _run(spark, data, steps, 60)
    assert got == expect


def test_funnel_requires_steps(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", 1)], "user_id long, time long, event_type string, event_id long"
    )
    with pytest.raises(ValueError):
        window_funnel(df, [], 10)


def test_funnel_single_shuffle_plan(spark):
    """All N window passes share one partitioning+sort: exactly one
    Exchange before the final aggregation, and no Python in the plan."""
    df = spark.createDataFrame(
        [(1, 10, "a", 1)], "user_id long, time long, event_type string, event_id long"
    )
    plan = window_funnel(
        df, ["a", "b", "c"], 50, tiebreak_col="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    # one shuffle for the window (hashpartitioning(user_id)), one for
    # the groupBy on the same key Catalyst reuses -> count real
    # Exchanges excluding the single-partition input
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_retention_cohorts(spark):
    rows = [
        # cohort 2024-01-01: users 1,2 anchor; user 1 active d+1, d+3
        (1, "2024-01-01", "signup"), (1, "2024-01-02", "view"),
        (1, "2024-01-04", "view"),
        (2, "2024-01-01", "signup"), (2, "2024-01-02", "click"),
        # user 3 anchors 2024-01-02 (first signup), earlier activity
        # doesn't move the anchor
        (3, "2024-01-01", "view"), (3, "2024-01-02", "signup"),
        (3, "2024-01-09", "view"),
        # user 4 never signs up -> in no cohort
        (4, "2024-01-01", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_type string"
    ).select("user_id", F.to_date("d").alias("date"), "event_type")
    out = retention_cohorts(df, "signup", offsets=(0, 1, 3, 7))
    got = {
        (str(r.cohort), r.day_offset): r.n_active for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 2,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 7): 1,
    }


def test_retention_offset_zero_counts_anchor_day(spark):
    df = spark.createDataFrame(
        [(1, "2024-03-05", "signup")], "user_id long, d string, event_type string"
    ).select("user_id", F.to_date("d").alias("date"), "event_type")
    out = retention_cohorts(df, "signup", offsets=(0, 1)).collect()
    assert [(str(r.cohort), r.day_offset, r.n_active) for r in out] == [
        ("2024-03-05", 0, 1)
    ]


def test_retention_flags_anchor_gating(spark):
    from carbon_clickhouse_spark.operators.events_analytics import (
        retention_flags,
    )

    rows = [
        (1, "signup"), (1, "view"),          # anchor + later cond
        (2, "view"),                          # later cond, NO anchor
        (3, "signup"),                        # anchor only
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["user_id"]: (r["r1"], r["r2"])
        for r in retention_flags(
            df, ["event_type = 'signup'", "event_type = 'view'"]
        ).collect()
    }
    # r2 is GATED on r1 (CH: r_i = cond1 AND cond_i)
    assert got == {1: (1, 1), 2: (0, 0), 3: (1, 0)}


def test_delta_sum_counter_semantics(spark):
    from carbon_clickhouse_spark.operators.events_analytics import (
        delta_sum,
    )

    rows = [
        # counter climbs 10->15->3 (reset) ->9: deltas +5, (reset
        # ignored), +6 => 11
        ("s", 1, 10.0), ("s", 2, 15.0), ("s", 3, 3.0), ("s", 4, 9.0),
        # single point: no delta
        ("t", 1, 100.0),
    ]
    df = spark.createDataFrame(rows, "g string, time long, value double")
    got = {
        r["g"]: r["delta_sum"]
        for r in delta_sum(df, ["g"], "value", "time").collect()
    }
    assert got == {"s": 11.0, "t": 0.0}


def test_delta_sum_single_exchange_plan(spark):
    from carbon_clickhouse_spark.operators.events_analytics import (
        delta_sum,
    )

    df = spark.createDataFrame(
        [("s", 1, 1.0)], "g string, time long, value double"
    )
    plan = (
        delta_sum(df, ["g"], "value", "time")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # one for window, partial agg
    assert "Python" not in plan
