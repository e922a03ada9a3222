"""windowFunnel strict modes (operators/events_analytics.py): the
window-DP strict_increase path and the sequential interrupt path
(strict_order / strict_deduplication / strict_once), each checked
against an independently written naive fold that mirrors the
ClickHouse single-slot algorithm."""

import random

import pytest

from carbon_clickhouse_spark.operators.events_analytics import (
    window_funnel,
)

STEPS = ["a", "b", "c"]


def naive_funnel(events, steps, window, modes=()):
    """Reference fold, written straight from the CH single-slot
    algorithm (slots overwritten, entries expanded per matching step
    ascending), with the documented deepest-at-interruption level."""
    n = len(steps)
    s_inc = "strict_increase" in modes
    s_ord = "strict_order" in modes
    s_dedup = "strict_deduplication" in modes
    s_once = "strict_once" in modes
    slots = [None] * n
    started = False
    for t, ty in sorted(events):
        cis = [i for i, s in enumerate(steps) if s == ty]
        if not cis:
            if s_ord and started:
                break
            continue
        stop = False
        for ci in (reversed(cis) if s_once else cis):
            if ci == 0:
                slots[0] = (t, t)
                started = True
                continue
            if s_dedup and slots[ci] is not None:
                stop = True
                break
            if s_ord and started and slots[ci - 1] is None:
                stop = True
                break
            if slots[ci - 1] is None:
                continue
            start, tev = slots[ci - 1]
            if t - start > window or (s_inc and not tev < t):
                continue
            slots[ci] = (start, t)
        if stop:
            break
    for i in range(n, 0, -1):
        if slots[i - 1] is not None:
            return i
    return 0


def _run(spark, per_user, steps, window, modes):
    rows = [
        (u, t, ty) for u, evs in per_user.items() for t, ty in evs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, time long, event_type string"
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            df, steps, window, modes=modes
        ).collect()
    }
    want = {
        u: naive_funnel(evs, steps, window, modes)
        for u, evs in per_user.items()
    }
    assert got == want, (modes, got, want)


def _random_users(seed, n_users=40, types="abcx"):
    rng = random.Random(seed)
    per_user = {}
    for u in range(n_users):
        evs = [
            (rng.randrange(0, 50), rng.choice(types))
            for _ in range(rng.randrange(1, 12))
        ]
        # distinct times per user: both impls then share one total
        # order regardless of tiebreak details
        seen, out = set(), []
        for t, ty in evs:
            while t in seen:
                t += 50
            seen.add(t)
            out.append((t, ty))
        per_user[u] = out
    return per_user


@pytest.mark.parametrize(
    "modes",
    [
        ("strict_increase",),
        ("strict_order",),
        ("strict_deduplication",),
        ("strict_once",),
        ("strict_order", "strict_increase"),
        ("strict_deduplication", "strict_order"),
        ("strict_deduplication", "strict_increase", "strict_order"),
    ],
)
def test_modes_match_naive_randomized(spark, modes):
    for seed in (3, 17):
        _run(spark, _random_users(seed), STEPS, 20, modes)


@pytest.mark.parametrize(
    "modes",
    [
        (),
        ("strict_increase",),
        ("strict_once",),
        ("strict_order",),
        ("strict_deduplication",),
    ],
)
def test_repeated_steps_match_naive_randomized(spark, modes):
    # repeated-type step lists across EVERY mode incl. default: the
    # default used to take the window-DP path, which cannot express
    # CH's one-event-advances-two-repeated-steps self-chain
    for steps in (["a", "a"], ["a", "b", "a"], ["b", "a", "a"]):
        _run(spark, _random_users(5), steps, 20, modes)


def test_default_mode_repeated_steps_self_chain(spark):
    # one 'a' event fills both slots of steps [a, a] in CH's default
    # ascending fold -> level 2 from a single event
    df = spark.createDataFrame(
        [(1, 10, "a")], "user_id long, time long, event_type string"
    )
    got = window_funnel(df, ["a", "a"], 100).collect()
    assert got[0]["funnel_level"] == 2


def test_repeated_step_list_and_strict_once(spark):
    # steps [a, a]: one 'a' event fills BOTH slots in the sequential
    # default fold; strict_once limits it to one
    per_user = {1: [(10, "a")], 2: [(10, "a"), (11, "a")]}
    _run(spark, per_user, ["a", "a"], 100, ("strict_once",))
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            spark.createDataFrame(
                [(1, 10, "a"), (2, 10, "a"), (2, 11, "a")],
                "user_id long, time long, event_type string",
            ),
            ["a", "a"],
            100,
            modes=("strict_once",),
        ).collect()
    }
    assert got == {1: 1, 2: 2}


def test_docs_example_strict_order(spark):
    # the CH docs example: A->B->D->C stops at D with level 2
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "d"), (1, 4, "c")],
        "user_id long, time long, event_type string",
    )
    got = window_funnel(
        df, STEPS, 100, modes=("strict_order",)
    ).collect()
    assert got[0]["funnel_level"] == 2
    # without the mode, level 3
    got = window_funnel(df, STEPS, 100).collect()
    assert got[0]["funnel_level"] == 3


def test_strict_increase_equal_timestamps(spark):
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b"), (1, 6, "c"),
         (2, 5, "a"), (2, 6, "b"), (2, 7, "c")],
        "user_id long, time long, event_type string",
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            df, STEPS, 100, tiebreak_col="event_type",
            modes=("strict_increase",),
        ).collect()
    }
    # user 1's a@5 -> b@5 violates strict increase; user 2 is clean
    assert got == {1: 1, 2: 3}


def test_strict_dedup_interrupts(spark):
    # b repeats after being matched -> stop at depth 2 (c never seen)
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c")],
        "user_id long, time long, event_type string",
    )
    got = window_funnel(
        df, STEPS, 100, modes=("strict_deduplication",)
    ).collect()
    assert got[0]["funnel_level"] == 2


def test_unknown_mode_raises(spark):
    df = spark.createDataFrame(
        [(1, 1, "a")], "user_id long, time long, event_type string"
    )
    with pytest.raises(ValueError, match="unknown windowFunnel mode"):
        window_funnel(df, STEPS, 10, modes=("strict_nonsense",))
