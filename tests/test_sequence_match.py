"""sequenceMatch / sequenceCount (operators/sequence_match.py),
validated against exhaustive chain search — the definition — on
randomized fixtures, so both the running-max DP and the earliest-end
counting loop are proven equivalent rather than spot-checked."""

import random

import pytest

from carbon_clickhouse_spark.operators.sequence_match import (
    sequence_count,
    sequence_match,
)


def chain_exists(rows, types, gaps, lo, hi):
    """Exhaustive: indices lo <= i1 < ... < ik <= hi with rows[i]
    matching types and each gap within bound."""
    n = len(types)

    def ext(level, last_t, idx):
        if level == n:
            return True
        for j in range(idx, hi + 1):
            t, _, ty = rows[j]
            if ty != types[level]:
                continue
            if level > 0:
                g = gaps[level - 1]
                if g is not None and t - last_t > g:
                    continue
            if ext(level + 1, t, j + 1):
                return True
        return False

    return ext(0, 0, lo)


def brute_match(rows, types, gaps):
    rows = sorted(rows)
    return 1 if rows and chain_exists(rows, types, gaps, 0, len(rows) - 1) else 0


def brute_count(rows, types, gaps):
    """Earliest-end greedy over exhaustive existence checks: find the
    minimal end index of a chain within the remaining suffix, count,
    continue strictly after it."""
    rows = sorted(rows)
    pos, count = 0, 0
    while pos < len(rows):
        end = None
        for e in range(pos, len(rows)):
            if rows[e][2] == types[-1] and chain_exists(
                rows, types, gaps, pos, e
            ):
                # chain must END at e: last step on row e
                if chain_ends_at(rows, types, gaps, pos, e):
                    end = e
                    break
        if end is None:
            break
        count += 1
        pos = end + 1
    return count


def chain_ends_at(rows, types, gaps, lo, e):
    n = len(types)
    if rows[e][2] != types[-1]:
        return False
    if n == 1:
        return True

    def ext(level, last_t, idx):
        # build first n-1 steps before e, then check gap to e
        if level == n - 1:
            g = gaps[n - 2]
            return g is None or rows[e][0] - last_t <= g
        for j in range(idx, e):
            t, _, ty = rows[j]
            if ty != types[level]:
                continue
            if level > 0:
                g = gaps[level - 1]
                if g is not None and t - last_t > g:
                    continue
            if ext(level + 1, t, j + 1):
                return True
        return False

    return ext(0, 0, lo)


def _mk(spark, data):
    return spark.createDataFrame(
        data, "user_id long, time long, event_type string, event_id long"
    )


def _match(spark, data, types, gaps):
    conds = [f"event_type = '{t}'" for t in types]
    out = sequence_match(
        _mk(spark, data), conds, gaps, tiebreak_col="event_id"
    ).collect()
    return {r.user_id: r.matched for r in out}


def _count(spark, data, types, gaps):
    conds = [f"event_type = '{t}'" for t in types]
    out = sequence_count(
        _mk(spark, data), conds, gaps, tiebreak_col="event_id"
    ).collect()
    return {r.user_id: r.n_matches for r in out}


def test_match_gap_bounds(spark):
    data = [
        # a->b gap 5 ok, b->c gap 100 exceeds 50
        (1, 0, "a", 1), (1, 5, "b", 2), (1, 105, "c", 3),
        # full chain within bounds
        (2, 0, "a", 4), (2, 5, "b", 5), (2, 50, "c", 6),
    ]
    assert _match(spark, data, ["a", "b", "c"], [10, 50]) == {1: 0, 2: 1}


def test_match_unbounded_gap(spark):
    data = [(1, 0, "a", 1), (1, 10_000, "b", 2)]
    assert _match(spark, data, ["a", "b"], [None]) == {1: 1}
    assert _match(spark, data, ["a", "b"], [100]) == {1: 0}


def test_match_dead_chain_does_not_block(spark):
    # a@0 dies (b needs gap<=2); a@3 -> b@4 succeeds
    data = [(1, 0, "a", 1), (1, 3, "a", 2), (1, 4, "b", 3)]
    assert _match(spark, data, ["a", "b"], [2]) == {1: 1}


def test_count_nonoverlap_and_dead_chains(spark):
    data = [
        # two disjoint a->b chains
        (1, 0, "a", 1), (1, 1, "b", 2), (1, 2, "a", 3), (1, 3, "b", 4),
        # dead first start must not block the viable second chain
        (2, 0, "a", 5), (2, 3, "a", 6), (2, 4, "b", 7),
        # one b consumed by one chain only
        (3, 0, "a", 8), (3, 1, "a", 9), (3, 2, "b", 10),
    ]
    got = _count(spark, data, ["a", "b"], [2])
    assert got == {1: 2, 2: 1, 3: 1}


def test_count_single_condition(spark):
    data = [(1, 0, "a", 1), (1, 1, "x", 2), (1, 2, "a", 3)]
    assert _count(spark, data, ["a"], None) == {1: 2}


def test_match_and_count_match_exhaustive_search(spark):
    rng = random.Random(11)
    types = ["s0", "s1", "s2"]
    gaps = [15, 30]
    data, want_m, want_c = [], {}, {}
    eid = 0
    for user in range(35):
        n = rng.randint(0, 11)
        rows = []
        for _ in range(n):
            eid += 1
            t = rng.randint(0, 90)
            ty = rng.choice(["s0", "s1", "s2", "x"])
            rows.append((t, eid, ty))
            data.append((user, t, ty, eid))
        if rows:
            want_m[user] = brute_match(rows, types, gaps)
            want_c[user] = brute_count(rows, types, gaps)
    assert _match(spark, data, types, gaps) == want_m
    assert _count(spark, data, types, gaps) == want_c


def test_match_single_shuffle_no_python(spark):
    df = _mk(spark, [(1, 0, "a", 1)])
    plan = (
        sequence_match(df, ["event_type = 'a'", "event_type = 'b'"], [60])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_validation(spark):
    df = _mk(spark, [(1, 0, "a", 1)])
    with pytest.raises(ValueError):
        sequence_match(df, [], None)
    with pytest.raises(ValueError):
        sequence_match(df, ["event_type = 'a'"], [1, 2])


def test_sequence_next_node_all_modes(spark):
    import pytest

    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_next_node,
    )

    rows = [
        # user 1: A B C D  -> head [A,B] => C; first_match [B] => C
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"), (1, 40, "D"),
        # user 2: X A B    -> head [A,B] => NULL (starts with X);
        #                     first_match [A,B] => NULL? A@20,B@30 -> next absent
        (2, 10, "X"), (2, 20, "A"), (2, 30, "B"),
        # user 3: B A      -> backward head [A,B] reads A@20,B@10 => NULL after? next absent
        (3, 10, "B"), (3, 20, "A"),
    ]
    df = spark.createDataFrame(rows, "user_id long, time long, event_type string")

    def run(**kw):
        return {
            r["user_id"]: r["next_event"]
            for r in sequence_next_node(df, **kw).collect()
        }

    got = run(steps=["A", "B"], direction="forward", base="head")
    assert got == {1: "C", 2: None, 3: None}
    got = run(steps=["B"], direction="forward", base="first_match")
    assert got == {1: "C", 2: None, 3: "A"}
    # backward tail: anchor at the LAST event, run scans back in
    # time, "next" is the event just before the run
    got = run(steps=["D", "C"], direction="backward", base="tail")
    assert got == {1: "B", 2: None, 3: None}
    # cross combo — forward last_match: anchor the LAST A on the
    # timeline, run forward
    got = run(steps=["A"], direction="forward", base="last_match")
    assert got == {1: "B", 2: "B", 3: None}
    # backward last_match: "what preceded the final A"
    got = run(steps=["A"], direction="backward", base="last_match")
    assert got == {1: None, 2: "X", 3: "B"}
    with pytest.raises(ValueError):
        sequence_next_node(df, steps=["A"], direction="sideways")
    with pytest.raises(ValueError):
        sequence_next_node(df, steps=["A"], base="middle")
    with pytest.raises(ValueError):
        sequence_next_node(df, steps=[])


def test_sequence_next_node_tiebreak_determinism(spark):
    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_next_node,
    )

    # two events at t=10: tiebreak column decides scan order
    rows = [(1, 10, 1, "A"), (1, 10, 2, "B"), (1, 20, 3, "C")]
    df = spark.createDataFrame(
        rows, "user_id long, time long, seq long, event_type string"
    )
    got = sequence_next_node(
        df, steps=["A", "B"], tiebreak_col="seq"
    ).collect()
    assert got[0]["next_event"] == "C"


def test_sequence_next_node_randomized_all_combos(spark):
    """Every (direction, base) combination equals an independently
    written fold of the timeline-anchored semantics on randomized
    multi-user fixtures."""
    import random

    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_next_node,
    )

    def naive(arr, steps, direction, base):
        tys = [ty for _, ty in arr]
        n, size = len(steps), len(tys)
        step = 1 if direction == "forward" else -1
        if base == "head":
            a = 1
        elif base == "tail":
            a = size
        elif base == "first_match":
            a = tys.index(steps[0]) + 1 if steps[0] in tys else 0
        else:
            a = (
                size - tys[::-1].index(steps[0])
                if steps[0] in tys
                else 0
            )
        if a <= 0:
            return None
        for i, s in enumerate(steps):
            j = a + i * step
            if j < 1 or j > size or tys[j - 1] != s:
                return None
        j = a + n * step
        return tys[j - 1] if 1 <= j <= size else None

    rng = random.Random(77)
    per_user = {}
    for u in range(60):
        evs, seen = [], set()
        for _ in range(rng.randrange(1, 10)):
            t = rng.randrange(0, 40)
            while t in seen:
                t += 40
            seen.add(t)
            evs.append((t, rng.choice("abcx")))
        per_user[u] = sorted(evs)
    rows = [(u, t, ty) for u, e in per_user.items() for t, ty in e]
    df = spark.createDataFrame(
        rows, "user_id long, time long, event_type string"
    )
    for direction in ("forward", "backward"):
        for base in ("head", "tail", "first_match", "last_match"):
            got = {
                r["user_id"]: r["next_event"]
                for r in sequence_next_node(
                    df, ["a", "b"], direction, base
                ).collect()
            }
            want = {
                u: naive(e, ["a", "b"], direction, base)
                for u, e in per_user.items()
            }
            assert got == want, (direction, base)


def _brute_exists(evs, types, lo_gaps, hi_gaps):
    """Independent reference: try every strictly-increasing row-index
    chain (events pre-sorted by (t, tiebreak))."""
    import itertools

    n = len(types)
    idx_by_step = [
        [i for i, (t, ty) in enumerate(evs) if ty == types[k]]
        for k in range(n)
    ]

    def ok(chain):
        for a, b in zip(chain, chain[1:]):
            if not b > a:
                return False
        for k in range(1, n):
            gap = evs[chain[k]][0] - evs[chain[k - 1]][0]
            lo, hi = lo_gaps[k - 1], hi_gaps[k - 1]
            if lo is not None and not gap > lo:
                return False
            if hi is not None and not gap <= hi:
                return False
        return True

    return int(any(ok(c) for c in itertools.product(*idx_by_step)))


def test_sequence_match_min_gap_strictness(spark):
    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_match,
    )

    # gap exactly == lo is NOT a match ((?t>N) is strict); lo+1 is
    df = spark.createDataFrame(
        [(1, 100, "a"), (1, 160, "b"),     # gap 60 == lo -> no
         (2, 100, "a"), (2, 161, "b")],    # gap 61 > lo -> yes
        "user_id long, time long, event_type string",
    )
    got = {
        r["user_id"]: r["matched"]
        for r in sequence_match(
            df,
            ["event_type = 'a'", "event_type = 'b'"],
            min_gaps=[60],
        ).collect()
    }
    assert got == {1: 0, 2: 1}


def test_sequence_match_mixed_bounds_vs_bruteforce(spark):
    import random

    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_match,
    )

    rng = random.Random(41)
    per_user = {}
    for u in range(60):
        evs = sorted(
            (rng.randrange(0, 300), rng.choice("abx"))
            for _ in range(rng.randrange(1, 25))
        )
        per_user[u] = evs
    rows = [(u, t, ty) for u, evs in per_user.items() for t, ty in evs]
    df = spark.createDataFrame(
        rows, "user_id long, time long, event_type string"
    )
    cases = [
        ([30, None], [None, 80]),   # min then max
        ([None, 10], [100, None]),  # max then min
        ([5, 5], [50, 50]),         # both bounds on both gaps
    ]
    for lo, hi in cases:
        got = {
            r["user_id"]: r["matched"]
            for r in sequence_match(
                df,
                ["event_type = 'a'", "event_type = 'b'",
                 "event_type = 'a'"],
                max_gaps=hi,
                min_gaps=lo,
            ).collect()
        }
        want = {
            u: _brute_exists(evs, ["a", "b", "a"], lo, hi)
            for u, evs in per_user.items()
        }
        assert got == want, (lo, hi)


def test_sequence_match_general_parity_with_window_dp(spark):
    """With no lower bounds the candidate-list fold must agree with
    the window-DP path on random data (two independent formulations
    of the same semantics)."""
    import random

    from carbon_clickhouse_spark.operators.sequence_match import (
        _conds,
        _sequence_match_general,
        sequence_match,
    )

    rng = random.Random(17)
    rows = []
    for u in range(40):
        t = 0
        for _ in range(rng.randrange(1, 20)):
            t += rng.randrange(1, 40)
            rows.append((u, t, rng.choice("abcx")))
    df = spark.createDataFrame(
        rows, "user_id long, time long, event_type string"
    )
    conds = ["event_type = 'a'", "event_type = 'b'", "event_type = 'c'"]
    dp = {
        r["user_id"]: r["matched"]
        for r in sequence_match(df, conds, max_gaps=[60, None]).collect()
    }
    gen = {
        r["user_id"]: r["matched"]
        for r in _sequence_match_general(
            df, _conds(conds), [None, None], [60, None],
            "time", "user_id", None,
        ).collect()
    }
    assert dp == gen


def _brute_count(evs, types, lo_gaps, hi_gaps):
    """Greedy earliest-end reference for non-overlapping counting:
    repeatedly brute-force the chain with the smallest last index over
    the remaining suffix."""
    import itertools

    n = len(types)
    start = 0
    count = 0
    while True:
        idx_by_step = [
            [i for i in range(start, len(evs)) if evs[i][1] == types[k]]
            for k in range(n)
        ]
        best_end = None
        for c in itertools.product(*idx_by_step):
            if not all(b > a for a, b in zip(c, c[1:])):
                continue
            ok = True
            for k in range(1, n):
                gap = evs[c[k]][0] - evs[c[k - 1]][0]
                lo, hi = lo_gaps[k - 1], hi_gaps[k - 1]
                if lo is not None and not gap > lo:
                    ok = False
                    break
                if hi is not None and not gap <= hi:
                    ok = False
                    break
            if ok and (best_end is None or c[-1] < best_end):
                best_end = c[-1]
        if best_end is None:
            return count
        count += 1
        start = best_end + 1


def test_sequence_count_min_gaps_vs_bruteforce(spark):
    import random

    from carbon_clickhouse_spark.operators.sequence_match import (
        sequence_count,
    )

    rng = random.Random(73)
    per_user = {}
    for u in range(40):
        evs = sorted(
            (rng.randrange(0, 200), rng.choice("abx"))
            for _ in range(rng.randrange(1, 22))
        )
        per_user[u] = evs
    rows = [(u, t, ty) for u, evs in per_user.items() for t, ty in evs]
    df = spark.createDataFrame(
        rows, "user_id long, time long, event_type string"
    )
    for lo, hi in ([10, None], [None, 15]), ([5], [40]):
        types = ["a", "b"] if len(lo) == 1 else ["a", "b", "a"]
        got = {
            r["user_id"]: r["n_matches"]
            for r in sequence_count(
                df,
                [f"event_type = '{t}'" for t in types],
                max_gaps=hi,
                min_gaps=lo,
            ).collect()
        }
        want = {
            u: _brute_count(evs, types, lo, hi)
            for u, evs in per_user.items()
        }
        assert got == want, (lo, hi)
