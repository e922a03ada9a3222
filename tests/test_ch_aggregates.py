"""ClickHouse aggregate parity (operators/ch_aggregates.py): exact
topK, mergeable SpaceSaving sketch bounds, sumMap, fixed histogram."""

import random
from collections import Counter
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.operators.ch_aggregates import (
    histogram_fixed,
    sum_map,
    top_k,
    top_k_sketch,
)


def test_top_k_exact_with_ties(spark):
    rows = [("g1", v) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"]]
    rows += [("g2", "x")]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = [
        (r.grp, r.value, r.cnt, r.rnk)
        for r in top_k(df, ["grp"], "v", k=2)
        .orderBy("grp", "rnk")
        .collect()
    ]
    # tie b/c at 3 resolves by value asc -> b
    assert got == [
        ("g1", "a", 5, 1),
        ("g1", "b", 3, 2),
        ("g2", "x", 1, 1),
    ]


def test_top_k_validation(spark):
    df = spark.createDataFrame([("g", "a")], "grp string, v string")
    with pytest.raises(ValueError):
        top_k(df, ["grp"], "v", k=0)
    with pytest.raises(ValueError):
        top_k_sketch(df, ["grp"], "v", k=0)
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", 1.0, 1.0, 4)


def test_top_k_sketch_bounds_and_heavy_hitters(spark):
    rng = random.Random(5)
    # skewed distribution: a few heavy values + a long tail
    vals = (
        ["hot1"] * 400 + ["hot2"] * 300 + ["hot3"] * 200
        + [f"tail{i}" for i in range(300) for _ in (0, 1)]
    )
    rng.shuffle(vals)
    true = Counter(vals)
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v string"
    ).repartition(8)
    out = top_k_sketch(df, ["grp"], "v", k=3, oversample=8).collect()
    got = {r.value: (r.cnt_lower, r.cnt_upper) for r in out}
    # the three heavy hitters dominate n/slots = 1500/24 -> guaranteed
    assert set(got) == {"hot1", "hot2", "hot3"}
    for v, (lo, hi) in got.items():
        assert lo <= true[v] <= hi, (v, lo, true[v], hi)


def test_top_k_sketch_single_partition_is_exact(spark):
    vals = ["a"] * 4 + ["b"] * 2 + ["c"]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v string"
    ).coalesce(1)
    out = top_k_sketch(df, ["grp"], "v", k=2, oversample=4).collect()
    got = [(r.value, r.cnt_lower, r.cnt_upper, r.rnk) for r in out]
    # summary never overflows (3 distinct < 8 slots): bounds are exact
    assert sorted(got) == [("a", 4, 4, 1), ("b", 2, 2, 2)]


def test_sum_map_exact_decimals(spark):
    df = spark.createDataFrame(
        [
            ("d1", ["k1", "k2"], [1.25, 2.50]),
            ("d1", ["k2", "k3"], [0.25, 10.00]),
            ("d2", ["k1"], [7.75]),
        ],
        "day string, ks array<string>, vs array<double>",
    )
    out = {
        (r.day, r.key): r.total
        for r in sum_map(df, ["day"], "ks", "vs").collect()
    }
    assert out[("d1", "k1")] == Decimal("1.250000")
    assert out[("d1", "k2")] == Decimal("2.750000")
    assert out[("d1", "k3")] == Decimal("10.000000")
    assert out[("d2", "k1")] == Decimal("7.750000")


def test_histogram_fixed_clamps_and_groups(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 24.9), ("a", 25.0), ("a", 199.9),
         ("a", 250.0), ("b", 100.0)],
        "grp string, v double",
    )
    out = {
        (r.grp, r.bucket): (r.cnt, r.bucket_lo)
        for r in histogram_fixed(df, "v", 0.0, 200.0, 8, ["grp"]).collect()
    }
    # -5 clamps into bucket 0; 250 clamps into bucket 7
    assert out[("a", 0)] == (3, 0.0)   # -5.0, 0.0, 24.9
    assert out[("a", 1)] == (1, 25.0)
    assert out[("a", 7)] == (2, 175.0)  # 199.9 and clamped 250
    assert out[("b", 4)] == (1, 100.0)


def test_null_handling_matches_clickhouse_skip_semantics(spark):
    """NULL values are skipped by topK (exact AND sketch — whose merge
    protocol reserves NULL for min-rows) and by histogram (greatest/
    least would otherwise funnel NULL/NaN into bucket 0)."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", None), ("g", "b"), ("g", "a")],
        "grp string, v string",
    )
    exact = [(r.value, r.cnt) for r in top_k(df, ["grp"], "v", 3).collect()]
    assert sorted(exact) == [("a", 2), ("b", 1)]
    sk = top_k_sketch(df, ["grp"], "v", k=3, oversample=2).collect()
    got = {r.value: (r.cnt_lower, r.cnt_upper) for r in sk}
    assert got == {"a": (2, 2), "b": (1, 1)}

    hdf = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (3.0,)], "v double"
    )
    out = {r.bucket: r.cnt for r in histogram_fixed(hdf, "v", 0, 4, 4).collect()}
    assert out == {1: 1, 3: 1}  # NULL and NaN rows excluded


def test_sum_map_rejects_length_mismatch(spark):
    df = spark.createDataFrame(
        [("d", ["a", "b"], [1.0])],
        "day string, ks array<string>, vs array<double>",
    )
    with pytest.raises(Exception, match="differ in length"):
        sum_map(df, ["day"], "ks", "vs").collect()


def test_uniq_sketch_estimate_and_merge(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        uniq_merge,
        uniq_sketch,
    )

    rows = [("d1" if i % 2 else "d2", f"u{i % 3000}") for i in range(10_000)]
    df = spark.createDataFrame(rows, "day string, user string")
    per_day = uniq_sketch(df, ["day"], "user")
    est = {
        r.day: r.uniq
        for r in uniq_merge(per_day, ["day"]).collect()
    }
    # true: d1 sees odd i -> 1500+? compute exactly
    import collections

    true = collections.defaultdict(set)
    for d, u in rows:
        true[d].add(u)
    for d in ("d1", "d2"):
        assert abs(est[d] - len(true[d])) / len(true[d]) < 0.05
    # merge across days: states fold, values never rescanned
    total = uniq_merge(
        per_day.select(F.lit("all").alias("all_"), "uniq_state"),
        ["all_"],
    ).collect()[0].uniq
    all_true = len(true["d1"] | true["d2"])
    assert abs(total - all_true) / all_true < 0.05


def test_top_k_plan_two_shuffles(spark):
    df = spark.createDataFrame([("g", "a")], "grp string, v string")
    plan = (
        top_k(df, ["grp"], "v", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_top_k_weighted_exact(spark):
    # topKWeighted: rank by summed weight, not row count
    rows = [
        ("g", "a", 1), ("g", "a", 1), ("g", "a", 1),   # a: 3 rows, w=3
        ("g", "b", 10),                                 # b: 1 row, w=10
        ("g", "c", 5), ("g", "c", None),                # c: w=5 (NULL skipped)
    ]
    df = spark.createDataFrame(rows, "g string, v string, w long")
    got = [
        (r["value"], r["cnt"], r["rnk"])
        for r in top_k(df, ["g"], "v", k=3, weight_col="w")
        .orderBy("rnk")
        .collect()
    ]
    assert got == [("b", 10, 1), ("c", 5, 2), ("a", 3, 3)]


def test_top_k_sketch_weighted_bounds(spark):
    import random

    rng = random.Random(23)
    # heavy value by weight (few rows, huge weights) + wide tail
    rows = [("g", "HH", 50) for _ in range(20)]        # w total 1000
    rows += [("g", f"t{rng.randrange(60)}", rng.randrange(1, 4))
             for _ in range(400)]
    df = spark.createDataFrame(
        rows, "g string, v string, w long"
    ).repartition(8)
    out = top_k_sketch(
        df, ["g"], "v", k=3, oversample=3, weight_col="w"
    ).collect()
    true = {}
    for _, v, w in rows:
        true[v] = true.get(v, 0) + w
    by_rank = {r["rnk"]: r for r in out}
    assert by_rank[1]["value"] == "HH"
    for r in out:
        t = true.get(r["value"], 0)
        assert r["cnt_lower"] <= t <= r["cnt_upper"], r


def test_top_k_sketch_weighted_single_partition_exact(spark):
    rows = [("g", "a", 2), ("g", "a", 3), ("g", "b", 4)]
    df = spark.createDataFrame(
        rows, "g string, v string, w long"
    ).coalesce(1)
    got = {
        r["value"]: (r["cnt_lower"], r["cnt_upper"])
        for r in top_k_sketch(
            df, ["g"], "v", k=5, weight_col="w"
        ).collect()
    }
    assert got == {"a": (5, 5), "b": (4, 4)}


def test_top_k_sketch_negative_weight_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [("g", "a", -1)], "g string, v string, w long"
    )
    with pytest.raises(Exception, match="negative weight"):
        top_k_sketch(df, ["g"], "v", k=1, weight_col="w").collect()


def test_map_aggregate_family(spark):
    import pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        map_aggregate,
    )

    rows = [
        ("g", ["a", "b"], [1.0, 10.0]),
        ("g", ["a", "c"], [3.0, 7.0]),
    ]
    df = spark.createDataFrame(
        rows, "g string, ks array<string>, vs array<double>"
    )

    def run(how):
        return {
            r["key"]: float(r["total"])
            for r in map_aggregate(df, ["g"], "ks", "vs", how).collect()
        }

    assert run("sum") == {"a": 4.0, "b": 10.0, "c": 7.0}
    assert run("min") == {"a": 1.0, "b": 10.0, "c": 7.0}
    assert run("max") == {"a": 3.0, "b": 10.0, "c": 7.0}
    assert run("avg") == {"a": 2.0, "b": 10.0, "c": 7.0}
    with pytest.raises(ValueError, match="how="):
        map_aggregate(df, ["g"], "ks", "vs", "median")

    # min/max must not be quantized to decimal(28,6): values that
    # differ only below 1e-6 keep distinct extrema
    tiny = spark.createDataFrame(
        [("g", ["a"], [1.0000000002]), ("g", ["a"], [1.0000000001])],
        "g string, ks array<string>, vs array<double>",
    )
    lo = map_aggregate(tiny, ["g"], "ks", "vs", "min").collect()[0]
    hi = map_aggregate(tiny, ["g"], "ks", "vs", "max").collect()[0]
    assert float(lo["total"]) == 1.0000000001
    assert float(hi["total"]) == 1.0000000002


def test_uniq_up_to_saturates(spark):
    import pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        uniq_up_to,
    )

    rows = [("a", i % 3) for i in range(20)] + [
        ("b", i) for i in range(10)
    ] + [("c", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r["g"]: r["uniq_up_to"]
        for r in uniq_up_to(df, ["g"], "v", n=5).collect()
    }
    assert got == {"a": 3, "b": 6, "c": 0}  # b saturates at n+1
    with pytest.raises(ValueError):
        uniq_up_to(df, ["g"], "v", n=0)


def test_arg_extrema_deterministic_ties(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import arg_extrema

    df = spark.createDataFrame(
        [("g", 1.0, 30), ("g", 1.0, 10), ("g", 5.0, 7), ("g", 5.0, 9)],
        "g string, v double, a long",
    )
    r = arg_extrema(df, ["g"], "v", "a").collect()[0]
    # ties on the min value: smallest arg; on the max: largest arg
    assert r["arg_min"] == 10 and r["arg_max"] == 9


def test_arg_extrema_skips_null_values(spark):
    """CH argMin/argMax ignore NULL values — an unfiltered NULL would
    win every arg_min through nulls-first struct ordering (ADVICE r7)."""
    from carbon_clickhouse_spark.operators.ch_aggregates import arg_extrema

    df = spark.createDataFrame(
        [("g", None, 1), ("g", 2.0, 2), ("g", 3.0, 3)],
        "g string, v double, a long",
    )
    r = arg_extrema(df, ["g"], "v", "a").collect()[0]
    assert r["arg_min"] == 2 and r["arg_max"] == 3
    # a group whose values are ALL NULL still EMITS its row, with
    # NULL args (ADVICE r8: a dropped row made q_ch_agg_breadth's
    # joins lose the whole group; CH keeps the group with a default)
    all_null = spark.createDataFrame(
        [("g", None, 1)], "g string, v double, a long"
    )
    rows = arg_extrema(all_null, ["g"], "v", "a").collect()
    assert len(rows) == 1
    assert rows[0]["arg_min"] is None and rows[0]["arg_max"] is None


def test_avg_weighted_exact(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import avg_weighted

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 10.0, 3)], "g string, v double, w long"
    )
    r = avg_weighted(df, ["g"], "v", "w").collect()[0]
    assert r["avg_weighted"] == (1.0 + 30.0) / 4


def test_quantile_exact_weighted_matches_ch_fold(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        quantile_exact_weighted,
    )

    # CH reference fold: merge equal values, sort, threshold
    # (sumW-1)*q, first value whose cumulative EXCEEDS it
    def ref(pairs, q):
        agg = {}
        for v, w in pairs:
            agg[v] = agg.get(v, 0) + w
        tw = sum(agg.values())
        thr = (tw - 1) * q
        cw = 0
        for v in sorted(agg):
            cw += agg[v]
            if cw > thr:
                return v

    import random

    rng = random.Random(11)
    rows = [
        ("g%d" % (i % 3), float(rng.randrange(0, 20)), rng.randrange(1, 5))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = {
            r["g"]: r["quantile"]
            for r in quantile_exact_weighted(df, ["g"], "v", "w", q).collect()
        }
        want = {
            g: ref([(v, w) for gg, v, w in rows if gg == g], q)
            for g in ("g0", "g1", "g2")
        }
        assert got == want, (q, got, want)


def test_group_uniq_array_sorted_and_capped(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_uniq_array,
    )

    df = spark.createDataFrame(
        [("g", 3), ("g", 1), ("g", 3), ("g", 2)], "g string, v long"
    )
    r = group_uniq_array(df, ["g"], "v").collect()[0]
    assert list(r["uniq_values"]) == [1, 2, 3]
    r2 = group_uniq_array(df, ["g"], "v", max_size=2).collect()[0]
    assert list(r2["uniq_values"]) == [1, 2]


def test_histogram_adaptive_exact_known_merge(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    # values 0,1,10,11,30 -> bins=3 merges (0,1) then (10,11):
    # centroids 0.5(w2), 10.5(w2), 30(w1)
    df = spark.createDataFrame(
        [(float(x),) for x in (0, 1, 10, 11, 30)], "v double"
    )
    rows = sorted(
        (r.bin, r.lower, r.upper, r.height)
        for r in histogram_adaptive(df, "v", 3).collect()
    )
    assert rows == [
        (0, 0.0, 5.5, 2.0),
        (1, 5.5, 20.25, 2.0),
        (2, 20.25, 30.0, 1.0),
    ]


def test_histogram_adaptive_exact_partition_independent(spark):
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    rng = random.Random(3)
    rows = [
        ("g%d" % (i % 2), rng.gauss(50 * (i % 2), 10.0)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    a = sorted(
        map(tuple, histogram_adaptive(df.repartition(1), "v", 8, ["g"]).collect())
    )
    b = sorted(
        map(tuple, histogram_adaptive(df.repartition(13), "v", 8, ["g"]).collect())
    )
    assert a == b  # exact mode: bit-identical under any partitioning
    # invariants: per group, heights sum to the row count, edges are
    # the true min/max, bins contiguous
    per_g = {}
    for g, b_, lo, hi, h in a:
        per_g.setdefault(g, []).append((b_, lo, hi, h))
    for g, bs in per_g.items():
        vals = [v for gg, v in rows if gg == g]
        bs.sort()
        assert sum(h for _, _, _, h in bs) == len(vals)
        assert bs[0][1] == min(vals) and bs[-1][2] == max(vals)
        for (b1, _, u1, _), (b2, l2, _, _) in zip(bs, bs[1:]):
            assert b2 == b1 + 1 and l2 == u1


def test_histogram_adaptive_sketch_invariants(spark):
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    rng = random.Random(9)
    vals = [rng.gauss(0, 1) for _ in range(2000)] + [
        rng.gauss(100, 5) for _ in range(2000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
    rows = sorted(
        (r.bin, r.lower, r.upper, r.height)
        for r in histogram_adaptive(df, "v", 6, exact=False).collect()
    )
    assert len(rows) <= 6
    assert sum(h for _, _, _, h in rows) == pytest.approx(len(vals))
    assert rows[0][1] == pytest.approx(min(vals))
    assert rows[-1][2] == pytest.approx(max(vals))
    # the two well-separated modes never merge into one bin: some bin
    # boundary falls in the empty middle
    assert any(20 < u < 80 for _, _, u, _ in rows[:-1])


def test_histogram_adaptive_skips_null_nan_and_validates(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (2.0,)], "v double"
    )
    rows = histogram_adaptive(df, "v", 4).collect()
    assert sum(r.height for r in rows) == 2.0
    with pytest.raises(ValueError):
        histogram_adaptive(df, "v", 0)


def test_histogram_merge_heap_equals_naive_scan(spark):
    """The O(D log D) heap merge must be pick-for-pick identical to
    the reference O(D^2) scan — exact ties included (integer grid
    values make equal gaps common)."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        _merge_centroids,
    )

    def naive(v, w, bins):
        v, w = list(v), list(w)
        while len(v) > bins:
            best, bg = 0, None
            for i in range(len(v) - 1):
                g = v[i + 1] - v[i]
                if bg is None or g < bg:
                    best, bg = i, g
            wm = w[best] + w[best + 1]
            v[best] = (v[best] * w[best] + v[best + 1] * w[best + 1]) / wm
            w[best] = wm
            del v[best + 1], w[best + 1]
        return v, w

    rng = random.Random(2)
    for trial in range(150):
        n = rng.randrange(1, 60)
        v = [float(x) for x in sorted(rng.sample(range(1000), n))]
        w = [float(rng.randrange(1, 5)) for _ in v]
        bins = rng.randrange(1, n + 1)
        assert _merge_centroids(v, w, bins) == naive(v, w, bins), trial


def test_sum_map_filtered(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        sum_map_filtered,
    )

    df = spark.createDataFrame(
        [
            ("d1", ["a", "b"], [1.0, 10.0]),
            ("d1", ["a", "c"], [3.0, 7.0]),
        ],
        "day string, ks array<string>, vs array<double>",
    )
    got = {
        (r.day, r.key): float(r.total)
        for r in sum_map_filtered(df, ["day"], "ks", "vs", ["a", "c"]).collect()
    }
    assert got == {("d1", "a"): 4.0, ("d1", "c"): 7.0}
    # the key filter is pushed below the aggregation: non-matching
    # pairs never shuffle
    plan = (
        sum_map_filtered(df, ["day"], "ks", "vs", ["a"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    agg_pos = plan.index("Aggregate")
    filt_pos = plan.rindex("Filter")
    assert filt_pos > agg_pos, plan  # below the aggregate in the tree


def test_group_array_moving_sum_and_avg(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_moving,
    )

    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0), ("g", 4, 4.0)],
        "g string, ord long, v double",
    )
    ms = group_array_moving(df, ["g"], "v", ["ord"], k=2).collect()[0]
    assert list(ms["moving"]) == [1.0, 3.0, 5.0, 7.0]
    # CH MovingAvg quirk: divide by the window size k even at the head
    ma = group_array_moving(df, ["g"], "v", ["ord"], k=2, how="avg").collect()[0]
    assert list(ma["moving"]) == [0.5, 1.5, 2.5, 3.5]
    # unbounded: prefix sums / true prefix averages
    mu = group_array_moving(df, ["g"], "v", ["ord"]).collect()[0]
    assert list(mu["moving"]) == [1.0, 3.0, 6.0, 10.0]
    # unbounded MovingAvg divides every element by the TOTAL count N
    # (CH docs example: ints [1,2,4,7] -> [0,0,1,3] = prefix/4), not
    # the prefix length
    mua = group_array_moving(df, ["g"], "v", ["ord"], how="avg").collect()[0]
    assert list(mua["moving"]) == [0.25, 0.75, 1.5, 2.5]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_array_moving(df, ["g"], "v", ["ord"], k=0)
    with _pytest.raises(ValueError):
        group_array_moving(df, ["g"], "v", ["ord"], how="median")


def test_interval_length_sum_and_max_intersections(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        interval_length_sum,
        max_intersections,
    )

    df = spark.createDataFrame(
        [
            ("g", 0.0, 10.0),    # |----------|
            ("g", 5.0, 15.0),    #      |----------|   union 0..15
            ("g", 20.0, 25.0),   #                       |-----|
            ("g", 22.0, 22.0),   # zero-length: nothing
            ("h", 1.0, 2.0),
        ],
        "g string, s double, e double",
    )
    got = {
        r["g"]: r["interval_length_sum"]
        for r in interval_length_sum(df, ["g"], "s", "e").collect()
    }
    assert got == {"g": 20.0, "h": 1.0}
    mi = {
        r["g"]: r["max_intersections"]
        for r in max_intersections(df, ["g"], "s", "e").collect()
    }
    # [0,10) and [5,15) overlap; the zero-length [22,22) never opens
    # (its -1 sorts before its +1 at the same instant)
    assert mi == {"g": 2, "h": 1}


def test_max_intersections_half_open_touching(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        max_intersections,
    )

    # [0,5) and [5,10): touching endpoints do NOT overlap (the end's
    # -1 sorts before the start's +1 at t=5)
    df = spark.createDataFrame(
        [("g", 0.0, 5.0), ("g", 5.0, 10.0)], "g string, s double, e double"
    )
    assert max_intersections(df, ["g"], "s", "e").collect()[0][
        "max_intersections"
    ] == 1


def test_histogram_adaptive_bucketed_sketch_deterministic(spark):
    """exact=False with buckets=P: the two-level merge is a pure
    function of the data — identical output under any physical
    partitioning (the property the histogram_adaptive_sketch oracle
    relies on), with the sketch invariants intact."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), rng.uniform(-50, 50)) for i in range(1500)]
    df = spark.createDataFrame(rows, "g string, v double")
    a = (
        histogram_adaptive(df, "v", 6, ["g"], exact=False, oversample=2, buckets=4)
        .orderBy("g", "bin")
        .collect()
    )
    b = (
        histogram_adaptive(
            df.repartition(17), "v", 6, ["g"], exact=False, oversample=2, buckets=4
        )
        .orderBy("g", "bin")
        .collect()
    )
    assert a == b
    # invariants: total height = row count per group, <= bins bins,
    # outer edges are the true min/max
    from collections import Counter, defaultdict

    heights = defaultdict(float)
    for r in a:
        heights[r["g"]] += r["height"]
    want = Counter(g for g, _ in rows)
    for g, tot in heights.items():
        assert abs(tot - want[g]) < 1e-6
    per_g = Counter(r["g"] for r in a)
    assert all(c <= 6 for c in per_g.values())
    lo = {g: min(v for gg, v in rows if gg == g) for g in want}
    hi = {g: max(v for gg, v in rows if gg == g) for g in want}
    for r in a:
        if r["bin"] == 0:
            assert r["lower"] == lo[r["g"]]
        if r["bin"] == per_g[r["g"]] - 1:
            assert r["upper"] == hi[r["g"]]


def test_stat_moments_matches_reference_fold(spark):
    """skewPop/kurtPop/covarPop/corr against a direct Python fold over
    the same quantized integers and the same final expression tree."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        stat_moments,
    )

    vals = [1.25, 2.5, 2.5, 7.75, 10.0, 3.5]
    ys = [3, 1, 4, 1, 5, 9]
    df = spark.createDataFrame(
        [("g", v, y) for v, y in zip(vals, ys)],
        "g string, v double, y long",
    )
    r = stat_moments(df, ["g"], "v", y_col="y").collect()[0]

    q = [round(v * 1000) for v in vals]
    n = float(len(q))
    s1, s2 = float(sum(q)), float(sum(x * x for x in q))
    s3 = float(sum(x**3 for x in q))
    s4 = float(sum(x**4 for x in q))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * (mean * mean * mean)
    m4 = (
        s4 / n
        - 4.0 * mean * (s3 / n)
        + 6.0 * (mean * mean) * (s2 / n)
        - 3.0 * ((mean * mean) * (mean * mean))
    )
    assert r["skew_pop"] == m3 / (m2 * math.sqrt(m2))
    assert r["kurt_pop"] == m4 / (m2 * m2)
    sy, sy2 = float(sum(ys)), float(sum(y * y for y in ys))
    sxy = float(sum(x * y for x, y in zip(q, ys)))
    meany = sy / n
    m2y = sy2 / n - meany * meany
    cov = sxy / n - mean * meany
    assert r["covar_pop"] == cov
    assert r["corr_pop"] == cov / math.sqrt(m2 * m2y)
    # NULL/NaN skipped like every CH aggregate here
    withnull = spark.createDataFrame(
        [("g", None, 1), ("g", float("nan"), 2)]
        + [("g", v, y) for v, y in zip(vals, ys)],
        "g string, v double, y long",
    )
    r2 = stat_moments(withnull, ["g"], "v", y_col="y").collect()[0]
    assert r2["skew_pop"] == r["skew_pop"]


def test_lttb_endpoints_and_known_pick(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets as lttb,
    )

    # 7 points, downsample to 3: one middle bucket (indices 1..5),
    # anchor = last point; the spike at t=3 wins the triangle
    pts = [(0, 0.0), (1, 1.0), (2, 1.0), (3, 50.0), (4, 1.0),
           (5, 1.0), (6, 0.0)]
    df = spark.createDataFrame(
        [("s", t, v) for t, v in pts], "g string, t long, v double"
    )
    got = [
        (r["rnk"], r["x"], r["y"])
        for r in lttb(df, ["g"], "t", "v", 3).orderBy("rnk").collect()
    ]
    assert got == [(1, 0, 0.0), (2, 3, 50.0), (3, 6, 0.0)]

    # n_out >= N returns every point; n_out=2 just the endpoints
    assert lttb(df, ["g"], "t", "v", 99).count() == 7
    two = [
        (r["x"], r["y"])
        for r in lttb(df, ["g"], "t", "v", 2).orderBy("rnk").collect()
    ]
    assert two == [(0, 0.0), (6, 0.0)]

    import pytest

    with pytest.raises(ValueError):
        lttb(df, ["g"], "t", "v", 1)


def test_lttb_partition_independent(spark):
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets as lttb,
    )

    rng = random.Random(3)
    rows = [
        ("g%d" % (i % 2), i, rng.uniform(-5, 5)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    a = lttb(df, ["g"], "t", "v", 12).orderBy("g", "rnk").collect()
    b = (
        lttb(df.repartition(13), ["g"], "t", "v", 12)
        .orderBy("g", "rnk")
        .collect()
    )
    assert a == b
    assert all(r["rnk"] <= 12 for r in a)


def test_bounding_ratio_slope_and_ties(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        bounding_ratio,
    )

    df = spark.createDataFrame(
        [("g", 0, 10.0), ("g", 5, 2.0), ("g", 10, 30.0)],
        "g string, x long, y double",
    )
    r = bounding_ratio(df, ["g"], "x", "y").collect()[0]
    assert r["bounding_ratio"] == (30.0 - 10.0) / 10.0
    # ties on x: smallest y wins the left end, largest the right
    ties = spark.createDataFrame(
        [("g", 0, 5.0), ("g", 0, 1.0), ("g", 10, 2.0), ("g", 10, 8.0)],
        "g string, x long, y double",
    )
    r2 = bounding_ratio(ties, ["g"], "x", "y").collect()[0]
    assert r2["bounding_ratio"] == (8.0 - 1.0) / 10.0
    # NULLs skipped
    withnull = spark.createDataFrame(
        [("g", None, 9.0), ("g", 0, 1.0), ("g", 4, 9.0)],
        "g string, x long, y double",
    )
    r3 = bounding_ratio(withnull, ["g"], "x", "y").collect()[0]
    assert r3["bounding_ratio"] == 2.0


def test_two_sample_tests_reference_fold(spark):
    """t/U/z against a direct Python fold over the same quantized
    integers and the same expression trees, plus a hand-checked
    Mann-Whitney with ties."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        two_sample_tests,
    )

    a = [1.0, 2.0, 3.0, 4.0, 5.0]        # sample 0
    b = [2.0, 4.0, 6.0, 8.0]             # sample 1 (ties with a at 2,4)
    rows = [("g", v, 0) for v in a] + [("g", v, 1) for v in b]
    df = spark.createDataFrame(rows, "g string, v double, s int")
    r = two_sample_tests(df, ["g"], "v", "s").collect()[0]

    q0 = [round(v * 1000) for v in a]
    q1 = [round(v * 1000) for v in b]
    n0, n1 = float(len(q0)), float(len(q1))
    m0 = float(sum(q0)) / n0
    m1 = float(sum(q1)) / n1
    v0 = (float(sum(x * x for x in q0)) / n0 - m0 * m0) * (n0 / (n0 - 1.0))
    v1 = (float(sum(x * x for x in q1)) / n1 - m1 * m1) * (n1 / (n1 - 1.0))
    sp2 = ((n0 - 1.0) * v0 + (n1 - 1.0) * v1) / (n0 + n1 - 2.0)
    assert r["t_student"] == (m0 - m1) / (
        math.sqrt(sp2) * math.sqrt(1.0 / n0 + 1.0 / n1)
    )
    assert r["t_welch"] == (m0 - m1) / math.sqrt(v0 / n0 + v1 / n1)
    se0, se1 = v0 / n0, v1 / n1
    assert r["dof_welch"] == ((se0 + se1) * (se0 + se1)) / (
        (se0 * se0) / (n0 - 1.0) + (se1 * se1) / (n1 - 1.0)
    )
    # midrank U by hand: pooled sorted 1,2,2,3,4,4,5,6,8
    # ranks:            1, 2.5,2.5, 4, 5.5,5.5, 7, 8, 9
    # R1 (sample 0: 1,2,3,4,5) = 1 + 2.5 + 4 + 5.5 + 7 = 20
    # U1 = 20 - 5*6/2 = 5
    assert r["u_stat"] == 5.0
    # z under the tie-corrected normal approximation
    nn = n0 + n1
    ties = float(sum(c ** 3 - c for c in (1, 2, 1, 2, 1, 1, 1)))
    sigma2 = (n0 * n1 / 12.0) * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    assert r["z_u"] == (5.0 - n0 * n1 / 2.0) / math.sqrt(sigma2)
    # KS D by hand over pooled distinct values 1,2,3,4,5,6,8:
    # cum0 = 1,2,3,4,5,5,5 ; cum1 = 0,1,1,2,2,3,4
    # |cum0*n1 - cum1*n0| = |4c0 - 5c1| -> 4,3,7,6,10,5,0 ; max 10
    assert r["ks_d"] == 10.0 / (n0 * n1)


def test_degenerate_inputs_return_nan_not_ansi_error(spark):
    """ANSI mode turns an exact-zero double division into a
    query-killing error; constant groups / sub-2-row samples /
    zero-x-range groups must come back as nan instead (review r8)."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        bounding_ratio,
        stat_moments,
        two_sample_tests,
    )

    # zero variance: skew/kurt/corr are nan, covar well-defined
    const = spark.createDataFrame(
        [("g", 5.0, 1), ("g", 5.0, 2)], "g string, v double, y long"
    )
    r = stat_moments(const, ["g"], "v", y_col="y").collect()[0]
    assert math.isnan(r["skew_pop"]) and math.isnan(r["kurt_pop"])
    assert math.isnan(r["corr_pop"]) and r["covar_pop"] == 0.0

    # single-row sample: t/dof/z nan, u still defined
    tiny = spark.createDataFrame(
        [("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1)],
        "g string, v double, s int",
    )
    r2 = two_sample_tests(tiny, ["g"], "v", "s").collect()[0]
    assert math.isnan(r2["t_student"]) and math.isnan(r2["t_welch"])
    assert math.isnan(r2["dof_welch"])
    assert r2["u_stat"] == 0.0  # both sample-0 values below sample 1's

    # every value tied: sigma = 0 -> z nan
    tied = spark.createDataFrame(
        [("g", 7.0, 0), ("g", 7.0, 0), ("g", 7.0, 1), ("g", 7.0, 1)],
        "g string, v double, s int",
    )
    r3 = two_sample_tests(tied, ["g"], "v", "s").collect()[0]
    assert math.isnan(r3["z_u"])

    # single point: bounding_ratio nan
    one = spark.createDataFrame(
        [("g", 3, 9.0)], "g string, x long, y double"
    )
    r4 = bounding_ratio(one, ["g"], "x", "y").collect()[0]
    assert math.isnan(r4["bounding_ratio"])

    # index values outside {0, 1} are ignored, not mispooled
    mixed = spark.createDataFrame(
        [("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1), ("g", 4.0, 1),
         ("g", 99.0, 2), ("g", 98.0, None)],
        "g string, v double, s int",
    )
    clean = spark.createDataFrame(
        [("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1), ("g", 4.0, 1)],
        "g string, v double, s int",
    )
    got = two_sample_tests(mixed, ["g"], "v", "s").collect()[0]
    want = two_sample_tests(clean, ["g"], "v", "s").collect()[0]
    assert got == want


def test_histogram_adaptive_rejects_buckets_with_exact(spark):
    import pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        histogram_adaptive,
    )

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="buckets"):
        histogram_adaptive(df, "v", 4, ["g"], exact=True, buckets=2)


def test_contingency_stats_hand_checked(spark):
    """2x2 table with known chi-square, plus degenerate guards and
    partition independence of the ordered fold."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        contingency_stats,
    )

    # o = [[10, 20], [20, 10]]: all e = 15, chi2 = 4 * 25/15 = 20/3
    rows = (
        [("g", "a", 0)] * 10 + [("g", "a", 1)] * 20
        + [("g", "b", 0)] * 20 + [("g", "b", 1)] * 10
    )
    df = spark.createDataFrame(rows, "g string, x string, y int")
    r = contingency_stats(df, ["g"], "x", "y").collect()[0]
    chi2 = 20.0 / 3.0
    assert abs(r["chi_sq"] - chi2) < 1e-12
    assert abs(r["cramers_v"] - math.sqrt(chi2 / 60.0)) < 1e-12
    assert abs(
        r["contingency_coef"] - math.sqrt(chi2 / (chi2 + 60.0))
    ) < 1e-12
    # bias-corrected: phi2+ = max(0, chi2/60 - 1/59); r~=c~=2-1/59
    phi2c = max(0.0, chi2 / 60.0 - 1.0 / 59.0)
    dt = (2.0 - 1.0 / 59.0) - 1.0
    assert abs(r["cramers_v_bc"] - math.sqrt(phi2c / dt)) < 1e-12

    # partition independence: the fold order is pinned by (x, y)
    r2 = contingency_stats(
        spark.createDataFrame(rows, "g string, x string, y int")
        .repartition(7),
        ["g"], "x", "y",
    ).collect()[0]
    assert r == r2

    # single column value: zero dof -> nan, not an ANSI error
    one_col = spark.createDataFrame(
        [("g", "a", 0), ("g", "b", 0)], "g string, x string, y int"
    )
    r3 = contingency_stats(one_col, ["g"], "x", "y").collect()[0]
    assert math.isnan(r3["cramers_v"])


def test_rank_corr_known_spearman(spark):
    """Midrank Spearman against a hand-computed example with ties,
    plus the degenerate contracts (perfect monotone = 1, constant
    variable = nan not an ANSI 0/0 error)."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import rank_corr

    rows = [
        ("g", 1.0, 2.0),
        ("g", 2.0, 4.0),
        ("g", 2.0, 5.0),
        ("g", 3.0, 1.0),
        ("g", 5.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = rank_corr(df, ["g"], "x", "y").collect()[0]["rank_corr"]
    # midranks: x -> [1, 2.5, 2.5, 4, 5], y -> [2, 4, 5, 1, 3]
    rx = [1.0, 2.5, 2.5, 4.0, 5.0]
    ry = [2.0, 4.0, 5.0, 1.0, 3.0]
    n = 5.0
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(got - want) < 1e-12

    mono = spark.createDataFrame(
        [("g", float(i), float(2 * i)) for i in range(6)],
        "g string, x double, y double",
    )
    assert abs(rank_corr(mono, ["g"], "x", "y").collect()[0]["rank_corr"] - 1.0) < 1e-12

    const = spark.createDataFrame(
        [("g", 1.0, float(i)) for i in range(4)],
        "g string, x double, y double",
    )
    assert math.isnan(rank_corr(const, ["g"], "x", "y").collect()[0]["rank_corr"])


def test_rank_corr_partition_independent(spark):
    """The half-rank power sums are exact DECIMAL — the result must
    be bit-identical under any input partitioning."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import rank_corr

    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 3), float(rng.randrange(0, 40)), float(rng.randrange(0, 9)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(df.coalesce(1), ["g"], "x", "y").collect()
    }
    b = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(df.repartition(13), ["g"], "x", "y").collect()
    }
    assert a == b  # bit-for-bit, not approx


def test_rank_corr_via_cells_bitwise(spark):
    """The distinct-value-bounded form (via_cells=True: joint-cell
    counts -> marginal midranks -> cell-weighted sums) must finalize
    BIT-identically to the window-sort form — same DECIMAL sums, same
    IEEE tree — including tie-heavy, constant (nan), and n=1 groups.
    This is the high-cardinality routing (r9 verdict #3): state is
    bounded by DISTINCT (x, y) pairs instead of an O(n log n)
    per-group sort."""
    import math
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import rank_corr

    rng = random.Random(31)
    rows = [
        ("g%d" % (i % 4), float(rng.randrange(0, 12)), float(rng.randrange(0, 5)))
        for i in range(500)
    ]
    rows += [("const", 3.0, float(i % 3)) for i in range(8)]  # vx = 0
    rows += [("solo", 1.5, 2.5)]  # n = 1
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(df, ["g"], "x", "y").collect()
    }
    b = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(df, ["g"], "x", "y", via_cells=True).collect()
    }
    assert set(a) == set(b)
    for g in a:
        if isinstance(a[g], float) and math.isnan(a[g]):
            assert math.isnan(b[g]), g
        else:
            assert a[g] == b[g], g  # bit-for-bit, not approx


def test_rank_corr_route_memo_and_hint(spark, monkeypatch):
    """r12 probe-free fast paths: (1) rebuilding the SAME logical
    rank_corr probes at most once per session — the per-plan memo
    keyed on the analyzed plan's semanticHash absorbs bench-style
    repeats, making the auto route deterministic within a session;
    (2) the session conf hint skips the probe entirely and forces
    the named route. Both routes are bit-identical, so this test
    watches the PROBE CALL COUNT, not values."""
    from pyspark.sql import functions as F

    from carbon_clickhouse_spark.operators import ch_aggregates as cha

    def build():
        # a deterministic source plan (like the bench's parquet
        # scans): createDataFrame would wrap a fresh RDD per call,
        # whose semanticHash legitimately differs
        df = spark.range(50).select(
            F.lit("g").alias("g"),
            (F.col("id") % 7).cast("double").alias("x"),
            (F.col("id") % 3).cast("double").alias("y"),
        )
        return cha.rank_corr(df, ["g"], "x", "y")

    calls = {"n": 0}
    real_probe = cha._rank_corr_probe

    def counting_probe(df, x, y, n):
        calls["n"] += 1
        return real_probe(df, x, y, n)

    monkeypatch.setattr(cha, "_rank_corr_probe", counting_probe)
    cha._rank_corr_route_memo.clear()
    a = build().collect()
    b = build().collect()  # same logical plan -> memo hit, no probe
    assert calls["n"] == 1
    assert a == b
    # conf hint: no probe at all, and the forced routes bit-match
    calls["n"] = 0
    cha._rank_corr_route_memo.clear()
    try:
        spark.conf.set(cha._RANK_CORR_ROUTE_CONF, "cells")
        c = build().collect()
        spark.conf.set(cha._RANK_CORR_ROUTE_CONF, "window")
        w = build().collect()
    finally:
        spark.conf.unset(cha._RANK_CORR_ROUTE_CONF)
    assert calls["n"] == 0
    assert c == w == a


def test_null_group_keys_survive_piece_joins(spark):
    """r11: operators that reassemble per-group pieces with a join
    must keep NULL group keys (CH GROUP BY keeps them): rank_corr's
    cells route must agree with the window route on a NULL key
    bitwise, two_sample_tests must emit the NULL group, and
    top_k_sketch's min-row merge join must not drop it."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        rank_corr,
        top_k_sketch,
        two_sample_tests,
    )

    rows = [
        (g, float(i % 7), float(i % 5))
        for g in (None, "g")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    win = {
        str(r["g"]): r["rank_corr"]
        for r in rank_corr(df, ["g"], "x", "y", via_cells=False).collect()
    }
    cel = {
        str(r["g"]): r["rank_corr"]
        for r in rank_corr(df, ["g"], "x", "y", via_cells=True).collect()
    }
    assert set(win) == set(cel) == {"None", "g"}
    for k in win:
        assert win[k] == cel[k] or (
            math.isnan(win[k]) and math.isnan(cel[k])
        )

    df2 = spark.createDataFrame(
        [
            (g, float(i % 7), i % 2)
            for g in (None, "g")
            for i in range(40)
        ],
        "g string, v double, cls int",
    )
    ts = two_sample_tests(df2, ["g"], "v", "cls").collect()
    assert sorted(str(r["g"]) for r in ts) == ["None", "g"]

    tk = top_k_sketch(df, ["g"], "x", k=3).collect()
    assert {str(r["g"]) for r in tk} == {"None", "g"}


def test_rank_corr_auto_routing(spark):
    """r11 (r10 verdict #2): via_cells=None probes a bounded sample
    and routes automatically. Pins (1) the decision on both shapes —
    rows >> distinct pairs -> cells, near-all-distinct -> window,
    sub-1000-row samples -> window (uninformative); (2) three-way
    bitwise equivalence auto == window == cells on the repeating-
    domain shape, so a routing flip can never change a value; (3) the
    explicit flags still skip the probe and force each route."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        _rank_corr_probe,
        rank_corr,
    )

    rng = random.Random(7)
    # rows >> distinct: 4000 rows over a 12x5 joint domain
    rep = spark.createDataFrame(
        [
            ("g%d" % (i % 4), float(rng.randrange(12)), float(rng.randrange(5)))
            for i in range(4000)
        ],
        "g string, x double, y double",
    )
    # near-all-distinct: continuous x, unique-ish y
    dis = spark.createDataFrame(
        [("g", rng.uniform(0, 1), float(i)) for i in range(4000)],
        "g string, x double, y double",
    )
    tiny = rep.limit(200)
    assert _rank_corr_probe(rep, "x", "y", 100_000) is True
    assert _rank_corr_probe(dis, "x", "y", 100_000) is False
    assert _rank_corr_probe(tiny, "x", "y", 100_000) is False

    auto = {r["g"]: r["rank_corr"] for r in rank_corr(rep, ["g"], "x", "y").collect()}
    win = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(rep, ["g"], "x", "y", via_cells=False).collect()
    }
    cel = {
        r["g"]: r["rank_corr"]
        for r in rank_corr(rep, ["g"], "x", "y", via_cells=True).collect()
    }
    assert auto == win == cel  # bit-for-bit


def test_theils_u_ch_documented_example(spark):
    """The ClickHouse docs' own worked example:
    theilsU(a, b) over (number % 10, number % 4) x 150 rows =
    -0.30195720557678846 — NEGATIVE, because CH returns
    (dep - h_a) / h_a, the sign-flipped textbook U(x|y); parity means
    reproducing that, not 'fixing' it. Tolerance covers the
    DECIMAL(28,12) per-term quantization (~1e-11)."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import theils_u

    rows = [("g", i % 10, i % 4) for i in range(150)]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    r = theils_u(df, ["g"], "a", "b").collect()[0]
    assert r["n_rows"] == 150
    assert abs(r["theils_u"] - (-0.30195720557678846)) < 1e-9

    # guards: single x class (zero x-entropy) and n < 2 -> nan
    one = spark.createDataFrame(
        [("g", 1, i % 3) for i in range(5)], "g string, a int, b int"
    )
    assert math.isnan(theils_u(one, ["g"], "a", "b").collect()[0]["theils_u"])
    tiny = spark.createDataFrame([("g", 1, 2)], "g string, a int, b int")
    assert math.isnan(theils_u(tiny, ["g"], "a", "b").collect()[0]["theils_u"])


def test_theils_u_partition_independent(spark):
    """Quantized-term DECIMAL sums are order-free: bit-identical
    across partitionings (the reason no fold order needs pinning)."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import theils_u

    rng = random.Random(11)
    rows = [
        ("g%d" % (i % 2), rng.randrange(0, 12), rng.randrange(0, 5))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    a = {r["g"]: r["theils_u"] for r in theils_u(df.coalesce(1), ["g"], "a", "b").collect()}
    b = {r["g"]: r["theils_u"] for r in theils_u(df.repartition(17), ["g"], "a", "b").collect()}
    assert a == b


def test_exponential_moving_average_matches_ch_fold(spark):
    """Against a literal replay of CH's ExponentiallySmoothedAverage
    add()/get() fold (decay to max time, normalize by the unit-step
    geometric series): the order-free quantized-term sum must land
    within the DECIMAL(28,12) envelope of the sequential fold, and a
    unit-step constant series must tend to the constant."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_moving_average,
    )

    def ch_fold(pairs, h):
        value, tm = 0.0, None
        for v, t in sorted(pairs, key=lambda p: p[1]):
            if tm is None or t > tm:
                value = (value * 2 ** ((tm - t) / h) if tm is not None else 0.0) + v
                tm = t
            else:
                value += v * 2 ** ((t - tm) / h)
        return value * (1 - 2 ** (-1.0 / h))

    rng = random.Random(3)
    pairs = [
        (rng.uniform(-5, 20), float(1000 + i * rng.randrange(1, 4)))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [("g", v, t) for v, t in pairs], "g string, v double, t double"
    )
    got = exponential_moving_average(df, ["g"], "v", "t", 7.0).collect()[0]["ema"]
    assert abs(got - ch_fold(pairs, 7.0)) < 1e-8

    unit = spark.createDataFrame(
        [("g", 1.0, float(i)) for i in range(200)],
        "g string, v double, t double",
    )
    assert abs(
        exponential_moving_average(unit, ["g"], "v", "t", 10.0)
        .collect()[0]["ema"] - 1.0
    ) < 1e-4


def test_exponential_time_decayed_avg(spark):
    """t_max-anchored decayed average against the direct formula,
    plus bit-exact partition independence (the point of quantizing
    terms to DECIMAL before the sum)."""
    import math
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_time_decayed_avg,
    )

    rng = random.Random(5)
    pairs = [
        (rng.uniform(0, 50), float(500 + 3 * i)) for i in range(150)
    ]
    df = spark.createDataFrame(
        [("g", v, t) for v, t in pairs], "g string, v double, t double"
    )
    tmax = max(t for _, t in pairs)
    num = sum(v * math.exp(-(tmax - t) / 40.0) for v, t in pairs)
    den = sum(math.exp(-(tmax - t) / 40.0) for _, t in pairs)
    got = exponential_time_decayed_avg(df, ["g"], "v", "t", 40.0).collect()[0]
    assert abs(got["decayed_avg"] - num / den) < 1e-8

    a = exponential_time_decayed_avg(df.coalesce(1), ["g"], "v", "t", 40.0).collect()
    b = exponential_time_decayed_avg(df.repartition(11), ["g"], "v", "t", 40.0).collect()
    assert a[0]["decayed_avg"] == b[0]["decayed_avg"]


def test_exponential_smoothing_validation(spark):
    import pytest as _pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_moving_average,
        exponential_time_decayed_avg,
    )

    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, v double, t double")
    with _pytest.raises(ValueError):
        exponential_moving_average(df, ["g"], "v", "t", 0.0)
    with _pytest.raises(ValueError):
        exponential_time_decayed_avg(df, ["g"], "v", "t", -1.0)


def test_lttb_partitioned_identity_regime(spark):
    """When per_partition covers every partition row, stage 1 is the
    identity and the composed pick EQUALS the global pick
    bit-for-bit — the exactness envelope the docstring promises."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets,
        largest_triangle_three_buckets_partitioned,
    )

    rng = random.Random(19)
    rows = []
    t = 1_600_000_000
    for m in range(4):  # four "months" of 60 points each
        for i in range(60):
            t += rng.randrange(50, 200)
            rows.append(("s", "m%d" % m, t, round(rng.uniform(-10, 80), 3)))
    df = spark.createDataFrame(rows, "g string, mon string, t long, v double")

    want = [
        (r["rnk"], r["x"], r["y"])
        for r in largest_triangle_three_buckets(
            df, ["g"], "t", "v", 20, order_cols=["t"]
        ).orderBy("rnk").collect()
    ]
    got = [
        (r["rnk"], r["x"], r["y"])
        for r in largest_triangle_three_buckets_partitioned(
            df, ["g"], "t", "v", 20, "mon",
            per_partition=100, order_cols=["t"],
        ).orderBy("rnk").collect()
    ]
    assert got == want


def test_lttb_partitioned_bounded_drift(spark):
    """Truncating regime: the composition keeps the global endpoints,
    emits exactly n_out real input rows, never crosses the series
    bounds, and every global pick has a composed pick within one
    global bucket span — the bounded-error claim, pinned on a fixed
    seeded series so the assertion is deterministic."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets,
        largest_triangle_three_buckets_partitioned,
    )

    rng = random.Random(23)
    rows = []
    t = 1_600_000_000
    for m in range(6):
        for i in range(300):
            t += rng.randrange(40, 120)
            rows.append(
                ("s", "m%d" % m, t,
                 round(50.0 * (1 + (i % 37) / 37.0) + rng.uniform(-4, 4), 3))
            )
    df = spark.createDataFrame(rows, "g string, mon string, t long, v double")
    all_x = {r[2] for r in rows}
    first_x, last_x = rows[0][2], rows[-1][2]

    n_out = 24
    comp = largest_triangle_three_buckets_partitioned(
        df, ["g"], "t", "v", n_out, "mon",
        per_partition=16, order_cols=["t"],
    ).orderBy("rnk").collect()
    assert len(comp) == n_out
    assert comp[0]["x"] == first_x and comp[-1]["x"] == last_x
    assert all(r["x"] in all_x for r in comp)  # real rows only

    glob = largest_triangle_three_buckets(
        df, ["g"], "t", "v", n_out, order_cols=["t"]
    ).orderBy("rnk").collect()
    span = (last_x - first_x) / (n_out - 2)  # one global bucket width
    comp_xs = [r["x"] for r in comp]
    for r in glob:
        assert min(abs(cx - r["x"]) for cx in comp_xs) <= span, r["x"]

    # determinism: bitwise stable under input repartitioning
    again = largest_triangle_three_buckets_partitioned(
        df.repartition(11), ["g"], "t", "v", n_out, "mon",
        per_partition=16, order_cols=["t"],
    ).orderBy("rnk").collect()
    assert [(r["x"], r["y"]) for r in again] == [(r["x"], r["y"]) for r in comp]


def test_lttb_partitioned_validation(spark):
    import pytest as _pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        largest_triangle_three_buckets_partitioned,
    )

    df = spark.createDataFrame(
        [("g", "m0", 1, 1.0)], "g string, mon string, t long, v double"
    )
    with _pytest.raises(ValueError):
        largest_triangle_three_buckets_partitioned(
            df, ["g"], "t", "v", 10, "mon", per_partition=1
        )


def test_simple_linear_regression_exact(spark):
    """y = 3x + 7 recovers (k=3, b=7) exactly in the unscaled system;
    zero x-variance (vertical line) -> nan, not an ANSI error; the
    exact decimal sums make the result partition-independent."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        simple_linear_regression,
    )

    df = spark.createDataFrame(
        [("g", float(i), 3.0 * i + 7.0) for i in range(12)],
        "g string, x double, y double",
    )
    r = simple_linear_regression(df, ["g"], "x", "y", 1, 1).collect()[0]
    assert r["k"] == 3.0 and r["b"] == 7.0

    c = spark.createDataFrame(
        [("g", 5.0, float(i)) for i in range(3)],
        "g string, x double, y double",
    )
    rc = simple_linear_regression(c, ["g"], "x", "y", 1, 1).collect()[0]
    assert math.isnan(rc["k"]) and math.isnan(rc["b"])

    big = spark.createDataFrame(
        [("g", float(i % 50), float((i * 7) % 90)) for i in range(500)],
        "g string, x double, y double",
    )
    a = simple_linear_regression(big.coalesce(1), ["g"], "x", "y").collect()[0]
    b = simple_linear_regression(big.repartition(13), ["g"], "x", "y").collect()[0]
    assert (a["k"], a["b"]) == (b["k"], b["b"])  # bitwise


def test_entropy_known_values(spark):
    """Uniform over 4 values = exactly 2 bits; a constant column = 0;
    NULLs skipped; decimal-quantized terms -> partition-independent."""
    from carbon_clickhouse_spark.operators.ch_aggregates import entropy_agg

    u = spark.createDataFrame(
        [("g", i % 4) for i in range(40)], "g string, v int"
    )
    assert entropy_agg(u, ["g"], "v").collect()[0]["entropy"] == 2.0
    one = spark.createDataFrame([("g", 1)] * 5, "g string, v int")
    assert entropy_agg(one, ["g"], "v").collect()[0]["entropy"] == 0.0
    withnull = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2)], "g string, v int"
    )
    assert entropy_agg(withnull, ["g"], "v").collect()[0]["entropy"] == 1.0


def test_categorical_information_value_hand_checked(spark):
    """IV per binary indicator against the direct WoE formula; empty
    cells -> nan."""
    import math
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        categorical_information_value,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        tag = rng.randrange(2)
        c1 = 1 if (rng.random() < (0.7 if tag else 0.3)) else 0
        rows.append(("g", c1, rng.randrange(2), tag))
    df = spark.createDataFrame(rows, "g string, c1 int, c2 int, tag int")
    got = categorical_information_value(
        df, ["g"], ["c1", "c2"], "tag"
    ).collect()[0]
    ev = sum(r[3] for r in rows)
    no = len(rows) - ev

    def ref(idx):
        e = sum(1 for r in rows if r[idx] == 1 and r[3] == 1)
        x = sum(1 for r in rows if r[idx] == 1 and r[3] == 0)
        pe, px = e / ev, x / no
        return (pe - px) * math.log(pe / px)

    assert abs(got["iv_c1"] - ref(1)) < 1e-12
    assert abs(got["iv_c2"] - ref(2)) < 1e-12

    # empty cell (c always 0 among tag=1) -> nan
    degen = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, 1), ("g", 1, 0), ("g", 0, 0)],
        "g string, c int, tag int",
    )
    r = categorical_information_value(degen, ["g"], ["c"], "tag").collect()[0]
    assert math.isnan(r["iv_c"])


def test_anova_f_hand_checked(spark):
    """One-way ANOVA against the direct SSB/SSW computation on the
    quantized values; single level -> nan; validation of dof."""
    import math
    import random
    from collections import defaultdict

    from carbon_clickhouse_spark.operators.ch_aggregates import anova_f

    rng = random.Random(11)
    rows = [
        ("g", "l%d" % (i % 3), round(rng.gauss(10 + (i % 3) * 2, 3), 3))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, lv string, v double")
    r = anova_f(df, ["g"], "v", "lv").collect()[0]

    groups = defaultdict(list)
    for _, l, v in rows:
        groups[l].append(round(v * 1000))
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    gm = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    fref = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r["f_stat"] - fref) < 1e-6 * fref
    assert r["df_between"] == k - 1 and r["df_within"] == n - k

    one = spark.createDataFrame(
        [("g", "a", float(i)) for i in range(5)],
        "g string, lv string, v double",
    )
    assert math.isnan(anova_f(one, ["g"], "v", "lv").collect()[0]["f_stat"])

    # pinned fold: bitwise identical across partitionings
    a = anova_f(df.coalesce(1), ["g"], "v", "lv").collect()[0]["f_stat"]
    b = anova_f(df.repartition(13), ["g"], "v", "lv").collect()[0]["f_stat"]
    assert a == b


def test_mean_z_test_known_variance(spark):
    """z with known population variances against the direct formula
    (raw-unit variances, descaled quantized means); empty sample ->
    nan; negative variance rejected."""
    import math
    import random

    import pytest as _pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import mean_z_test

    rng = random.Random(13)
    rows = [
        ("g", round(rng.gauss(5 if i % 2 else 6, 2), 3), i % 2)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v double, s int")
    z = mean_z_test(df, ["g"], "v", "s", 4.0, 4.0).collect()[0]["z_stat"]
    s0 = [round(v * 1000) for _, v, i in rows if i == 0]
    s1 = [round(v * 1000) for _, v, i in rows if i == 1]
    zref = ((sum(s0) / len(s0) - sum(s1) / len(s1)) / 1000.0) / math.sqrt(
        4.0 / len(s0) + 4.0 / len(s1)
    )
    assert abs(z - zref) < 1e-10

    onesided = spark.createDataFrame(
        [("g", 1.0, 0), ("g", 2.0, 0)], "g string, v double, s int"
    )
    assert math.isnan(
        mean_z_test(onesided, ["g"], "v", "s", 1.0, 1.0).collect()[0]["z_stat"]
    )
    with _pytest.raises(ValueError):
        mean_z_test(df, ["g"], "v", "s", -1.0, 1.0)


def test_corr_matrix_hand_checked(spark):
    """Pairwise covariance/correlation against the direct formula on
    quantized values; diagonal corr = 1; validation; bitwise
    partition independence (exact sums)."""
    import itertools
    import math
    import random

    import pytest as _pytest

    from carbon_clickhouse_spark.operators.ch_aggregates import corr_matrix

    rng = random.Random(3)
    rows = [
        (
            "g",
            round(rng.gauss(0, 5), 3),
            round(rng.gauss(0, 2), 3),
            float(rng.randrange(10)),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double, c double")
    out = {
        (r["x_name"], r["y_name"]): (r["covar_pop"], r["corr_pop"])
        for r in corr_matrix(df, ["g"], ["a", "b", "c"]).collect()
    }
    assert len(out) == 6
    q = {
        c: [round(r[i + 1] * 1000) for r in rows]
        for i, c in enumerate(["a", "b", "c"])
    }
    n = len(rows)
    for x, y in itertools.combinations_with_replacement(["a", "b", "c"], 2):
        mx, my = sum(q[x]) / n, sum(q[y]) / n
        cov = sum(p * r for p, r in zip(q[x], q[y])) / n - mx * my
        vx = sum(p * p for p in q[x]) / n - mx * mx
        vy = sum(p * p for p in q[y]) / n - my * my
        gc, gr = out[(x, y)]
        assert abs(gc - cov) < 1e-6 * max(1.0, abs(cov))
        assert abs(gr - cov / math.sqrt(vx * vy)) < 1e-9
    assert out[("a", "a")][1] == 1.0

    # r11 ADVICE: a clean ValueError for <2 columns (not an obscure
    # Py4J error from filter(None)), from both the operator and the
    # shared-filter helper the streaming twin calls
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        corr_matrix_filter,
    )

    with _pytest.raises(ValueError):
        corr_matrix(df, ["g"], ["a"])
    with _pytest.raises(ValueError):
        corr_matrix(df, ["g"], [])
    with _pytest.raises(ValueError):
        corr_matrix_filter([])

    a = sorted(corr_matrix(df.coalesce(1), ["g"], ["a", "b", "c"]).collect())
    b = sorted(corr_matrix(df.repartition(9), ["g"], ["a", "b", "c"]).collect())
    assert a == b


def test_exponential_time_decayed_family(spark):
    """Sum/Count/Max at the t_max anchor against the direct formulas;
    quantized terms keep everything partition-independent bitwise."""
    import math
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_time_decayed,
    )

    rng = random.Random(9)
    pairs = [(rng.uniform(-5, 20), float(100 + 3 * i)) for i in range(100)]
    df = spark.createDataFrame(
        [("g", v, t) for v, t in pairs], "g string, v double, t double"
    )
    r = exponential_time_decayed(df, ["g"], "v", "t", 60.0).collect()[0]
    tmax = max(t for _, t in pairs)
    assert abs(
        r["decayed_sum"]
        - sum(v * math.exp(-(tmax - t) / 60) for v, t in pairs)
    ) < 1e-8
    assert abs(
        r["decayed_count"]
        - sum(math.exp(-(tmax - t) / 60) for _, t in pairs)
    ) < 1e-8
    assert abs(
        r["decayed_max"]
        - max(v * math.exp(-(tmax - t) / 60) for v, t in pairs)
    ) < 1e-9
    a = exponential_time_decayed(df.coalesce(1), ["g"], "v", "t", 60.0).collect()[0]
    b = exponential_time_decayed(df.repartition(7), ["g"], "v", "t", 60.0).collect()[0]
    assert (a["decayed_sum"], a["decayed_count"], a["decayed_max"]) == (
        b["decayed_sum"], b["decayed_count"], b["decayed_max"]
    )


def test_group_bit_ops(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import group_bit_ops

    df = spark.createDataFrame(
        [("g", 0b1100), ("g", 0b1010), ("g", None)], "g string, v long"
    )
    r = group_bit_ops(df, ["g"], "v").collect()[0]
    assert r["bit_and"] == 0b1000
    assert r["bit_or"] == 0b1110
    assert r["bit_xor"] == 0b0110


def test_variance_family_hand_checked(spark):
    """var/stddev pop+samp and covarSamp against direct formulas on
    the quantized grid; n=1 makes the sample forms nan."""
    import math
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        variance_family,
    )

    rng = random.Random(5)
    vals = [round(rng.gauss(10, 4), 3) for _ in range(200)]
    ys = [rng.randrange(20) for _ in range(200)]
    df = spark.createDataFrame(
        [("g", v, y) for v, y in zip(vals, ys)],
        "g string, v double, y int",
    )
    r = variance_family(df, ["g"], "v", y_col="y").collect()[0]
    q = [round(v * 1000) for v in vals]
    n = len(q)
    mean = sum(q) / n
    vp = sum(x * x for x in q) / n - mean * mean
    vs = (sum(x * x for x in q) - sum(q) ** 2 / n) / (n - 1)
    cs = (sum(a * b for a, b in zip(q, ys)) - sum(q) * sum(ys) / n) / (n - 1)
    assert abs(r["var_pop"] - vp) < 1e-6 * vp
    assert abs(r["var_samp"] - vs) < 1e-6 * vs
    assert abs(r["stddev_pop"] - math.sqrt(vp)) < 1e-9 * math.sqrt(vp)
    assert abs(r["covar_samp"] - cs) < 1e-6 * abs(cs)

    one = spark.createDataFrame([("g", 1.0, 1)], "g string, v double, y int")
    ro = variance_family(one, ["g"], "v", y_col="y").collect()[0]
    assert ro["var_pop"] == 0.0
    assert math.isnan(ro["var_samp"]) and math.isnan(ro["covar_samp"])


def test_group_array_sorted_and_sum_count(spark):
    """Bounded-N sorted head (ties keep duplicates), NULL skip, and
    the exact sumCount tuple; plan check: the collect happens AFTER
    the rank prune (aggregation state bounded by N)."""
    from decimal import Decimal

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_sorted,
        sum_count,
    )

    df = spark.createDataFrame(
        [("g", v) for v in [5, 1, 3, 1, None, 9, 2]], "g string, v int"
    )
    r = group_array_sorted(df, ["g"], "v", 4).collect()[0]
    assert r["sorted_values"] == [1, 1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_array_sorted(df, ["g"], "v", 0)

    sc = sum_count(
        spark.createDataFrame(
            [("g", 1.25), ("g", 2.5), ("g", None)], "g string, v double"
        ),
        ["g"],
        "v",
    ).collect()[0]
    assert sc["sum"] == Decimal("3.750000") and sc["cnt"] == 2

    plan = (
        group_array_sorted(df, ["g"], "v", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the filter on row_number must sit below the final aggregate
    assert "row_number" in plan and "collect_list" in plan


def test_exponential_smoothing_fused_parity(spark):
    """The fused operator must equal the two single operators BITWISE
    (identical quantized terms and finals). Plan shape (r10): the
    t_max anchor comes from a tiny per-group aggregate joined back —
    NO window (the window form materialized every group's rows in one
    task buffer, 2.0x at 10x data), two bounded hash Exchanges."""
    import random

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_moving_average,
        exponential_smoothing,
        exponential_time_decayed_avg,
    )

    rng = random.Random(17)
    rows = [
        ("g%d" % (i % 3), rng.uniform(-10, 40), float(1000 + 5 * i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double, t double")
    fused = {
        r["g"]: (r["ema"], r["decayed_avg"])
        for r in exponential_smoothing(
            df, ["g"], "v", "t", 7.0, 11.0
        ).collect()
    }
    ema = {
        r["g"]: r["ema"]
        for r in exponential_moving_average(df, ["g"], "v", "t", 7.0).collect()
    }
    dav = {
        r["g"]: r["decayed_avg"]
        for r in exponential_time_decayed_avg(
            df, ["g"], "v", "t", 11.0
        ).collect()
    }
    for g in ema:
        assert fused[g] == (ema[g], dav[g])  # bitwise

    plan = (
        exponential_smoothing(df, ["g"], "v", "t", 7.0, 11.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window" not in plan


def test_decayed_family_keeps_null_group_keys(spark):
    """r11 ADVICE (medium): the _with_group_tmax join-back must be
    NULL-SAFE on the group keys. The window form it replaced kept
    NULL keys as their own partition and ClickHouse GROUP BY keeps
    NULL groups; a name-equality join silently dropped them. Pins:
    (1) every family member emits the NULL-key group, (2) its values
    equal a relabeled copy of the same rows bitwise, (3) multi-column
    keys with partial NULLs survive too."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_moving_average,
        exponential_smoothing,
        exponential_time_decayed,
        exponential_time_decayed_avg,
    )

    rows = [
        (None, 3.0, 1000.0),
        (None, 5.0, 1010.0),
        (None, -2.0, 1025.0),
        ("g", 1.0, 1000.0),
        ("g", 4.0, 1030.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, t double")
    # identical rows with the NULL group relabeled to a real key:
    # the NULL group's numbers must match that key's bitwise
    relabeled = spark.createDataFrame(
        [("z" if g is None else g, v, t) for g, v, t in rows],
        "g string, v double, t double",
    )

    for fn, cols, params in [
        (exponential_moving_average, ["ema"], (7.0,)),
        (exponential_time_decayed_avg, ["decayed_avg"], (11.0,)),
        (exponential_smoothing, ["ema", "decayed_avg"], (7.0, 11.0)),
        (
            exponential_time_decayed,
            ["decayed_sum", "decayed_count", "decayed_max"],
            (11.0,),
        ),
    ]:
        got = {r["g"]: r for r in fn(df, ["g"], "v", "t", *params).collect()}
        assert None in got, f"{fn.__name__} dropped the NULL group"
        assert set(got) == {None, "g"}
        ref = {
            r["g"]: r
            for r in fn(relabeled, ["g"], "v", "t", *params).collect()
        }
        for c in cols:
            assert got[None][c] == ref["z"][c]  # bitwise
            assert got["g"][c] == ref["g"][c]

    # multi-column group keys with partial NULLs
    mdf = spark.createDataFrame(
        [
            (None, "a", 2.0, 10.0),
            (None, "a", 6.0, 20.0),
            ("x", None, 3.0, 10.0),
            (None, None, 4.0, 10.0),
            ("x", "a", 5.0, 10.0),
        ],
        "g1 string, g2 string, v double, t double",
    )
    got = exponential_moving_average(
        mdf, ["g1", "g2"], "v", "t", 7.0
    ).collect()
    keys = {(r["g1"], r["g2"]) for r in got}
    assert keys == {(None, "a"), ("x", None), (None, None), ("x", "a")}


def test_group_array_intersect(spark):
    """Intersection semantics: duplicates within a row count once,
    empty intersection emits an empty array, all-NULL groups drop,
    NULL rows are skipped; plan never collects arrays into state."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_intersect,
    )

    df = spark.createDataFrame(
        [
            ("g", [1, 2, 3, 2]),
            ("g", [2, 3, 4]),
            ("g", [3, 2]),
            ("h", [5]),
            ("h", [6]),
            ("i", None),
            ("j", [7]),
            ("j", None),
        ],
        "g string, a array<int>",
    )
    out = {
        r["g"]: r["intersect_values"]
        for r in group_array_intersect(df, ["g"], "a").collect()
    }
    assert out == {"g": [2, 3], "h": [], "j": [7]}

    plan = (
        group_array_intersect(df, ["g"], "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # collect_list runs over SURVIVOR elements only (partial + final
    # stages of the same aggregate) — never over the raw arrays
    assert "collect_list(__e" in plan
    assert "collect_list(__a" not in plan


def test_group_array_intersect_no_broadcast_fallback(spark):
    """The per-group totals join carries NO broadcast hint (r9
    advice: totals size is bounded by GROUP cardinality, so an
    unconditional hint can blow the driver at 10^8+ groups). Under a
    disabled broadcast ceiling the survivor join must plan as a
    shuffle join and still produce identical results."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_intersect,
    )

    df = spark.createDataFrame(
        [("g", [1, 2, 3]), ("g", [2, 3, 4]), ("h", [5]), ("h", [5, 6])],
        "g string, a array<int>",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = group_array_intersect(df, ["g"], "a")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        out = {r["g"]: r["intersect_values"] for r in q.collect()}
        assert out == {"g": [2, 3], "h": [5]}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_stat_moments_samp_known_values(spark):
    """skewSamp/kurtSamp pinned to CH's exact form (population central
    moments over varSamp = n*m2/(n-1)) on hand-computable data, plus
    the n=1 and zero-variance nan guards."""
    import math

    from carbon_clickhouse_spark.operators.ch_aggregates import (
        stat_moments_samp,
    )

    vals = [1.0, 2.0, 4.0, 8.0]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((v - mean) ** 2 for v in vals) / n
    m3 = sum((v - mean) ** 3 for v in vals) / n
    m4 = sum((v - mean) ** 4 for v in vals) / n
    vs = m2 * n / (n - 1)
    rows = [("g", v) for v in vals] + [("solo", 5.0)] + [
        ("const", 3.0), ("const", 3.0), ("const", 3.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in stat_moments_samp(df, ["g"], "v").collect()}
    assert abs(got["g"]["skew_samp"] - m3 / vs**1.5) < 1e-9
    assert abs(got["g"]["kurt_samp"] - m4 / vs**2) < 1e-9
    assert got["g"]["n_rows"] == 4
    assert math.isnan(got["solo"]["skew_samp"])  # n = 1
    assert math.isnan(got["const"]["kurt_samp"])  # zero variance


def test_max_intersections_position(spark):
    """CH maxIntersectionsPosition: the earliest sweep position where
    the peak depth is first reached. Intervals [1,5) [2,6) [4,8): all
    three overlap on [4,5), so depth peaks at 3 first at t=4; a
    tie-heavy group where depth 2 is reached twice ([1,3) [2,4) then
    [6,9) [7,10)) reports the FIRST attainment (t=2); a disjoint
    group peaks at 1 at its earliest start. Half-open: [1,2) [2,3)
    never overlap (the end at 2 sorts before the start at 2)."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        max_intersections_position,
    )

    rows = [
        ("g", 1.0, 5.0), ("g", 2.0, 6.0), ("g", 4.0, 8.0),
        ("t", 1.0, 3.0), ("t", 2.0, 4.0), ("t", 6.0, 9.0), ("t", 7.0, 10.0),
        ("h", 10.0, 11.0), ("h", 20.0, 21.0),
        ("ho", 1.0, 2.0), ("ho", 2.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, s double, e double")
    got = {
        r["g"]: (r["max_intersections"], r["max_intersections_position"])
        for r in max_intersections_position(df, ["g"], "s", "e").collect()
    }
    assert got["g"] == (3, 4.0)
    assert got["t"] == (2, 2.0)
    assert got["h"] == (1, 10.0)
    assert got["ho"] == (1, 1.0)


def test_sum_with_overflow(spark):
    """CH sumWithOverflow: int64 two's-complement wraparound of the
    exact sum, hand-checked against Python's own ring arithmetic —
    a group summing past 2^63 wraps negative; a small group equals
    the plain sum; NULLs skip — and an ALL-NULL group keeps its key
    with a NULL sum instead of vanishing (ADVICE r11: CH GROUP BY
    keeps the key; sumWithOverflow(Nullable) yields NULL there)."""
    big = 2**62
    rows = [("g", big), ("g", big), ("g", big),  # 3*2^62 wraps
            ("h", 5), ("h", 7), ("h", None),
            ("z", None), ("z", None)]           # all-NULL group
    df = spark.createDataFrame(rows, "g string, v long")
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        sum_with_overflow,
    )

    got = {r["g"]: r["sum_overflow"]
           for r in sum_with_overflow(df, ["g"], "v").collect()}
    want_g = ((3 * big + 2**63) % 2**64) - 2**63
    assert got["g"] == want_g and want_g < 0
    assert got["h"] == 12
    assert "z" in got and got["z"] is None


def test_group_array_last(spark):
    """CH groupArrayLast(N): last n values in (deterministic) order,
    emitted in encounter order; NULLs skip; state pruned to n rows
    before the collect."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_last,
    )

    rows = [("g", i, float(i)) for i in range(1, 6)]  # o 1..5
    rows += [("g", 6, None), ("h", 1, 9.0),
             ("z", 1, None), ("z", 2, None)]  # all-NULL group
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {r["g"]: r["last_values"]
           for r in group_array_last(df, ["g"], "v", 3, "o").collect()}
    assert got["g"] == [3.0, 4.0, 5.0]  # NULL at o=6 skipped
    assert got["h"] == [9.0]
    assert got["z"] == []  # key kept, empty state (CH emits [])


def test_single_value_or_null(spark):
    """CH singleValueOrNull: the value iff exactly one distinct
    non-NULL value; NULL otherwise — incl. the all-NULL group, which
    keeps its key."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        single_value_or_null,
    )

    rows = [("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 2.0),
            ("c", None), ("c", None), ("d", 7.0), ("d", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["single_value"]
           for r in single_value_or_null(df, ["g"], "v").collect()}
    assert got == {"a": 5.0, "b": None, "c": None, "d": 7.0}


def test_sparkbar(spark):
    """CH sparkbar(width): per-bucket y sums drawn with the block
    ramp — equal buckets all render the full block, an empty bucket
    renders a space, the tallest bucket pins level 8, and the pinned
    bucket/level formulas are the ones the oracle replays."""
    from carbon_clickhouse_spark.operators.ch_aggregates import sparkbar

    rows = [("g", x, 1.0) for x in range(10)]           # uniform
    rows += [("s", 0, 1.0), ("s", 9, 8.0)]              # skew + gaps
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {r["g"]: r["sparkbar"]
           for r in sparkbar(df, ["g"], "x", "y", 5).collect()}
    assert got["g"] == "█████"   # equal sums -> all level 8
    # s: span 10, buckets 0 and 4 hit; sums 1 and 8 -> levels
    # ceil(1*8/8)=1, 8 -> glyphs ▁ and █ with 3 spaces between
    assert got["s"] == "▁   █"


def test_any_heavy(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import any_heavy

    rows = (
        [("g1", "a")] * 5 + [("g1", "b")] * 3        # a is a majority
        + [("g2", "x")] * 2 + [("g2", "y")] * 2      # no majority
        + [("g3", None)] * 3                         # all-NULL group
        + [("g4", "m")] * 3 + [("g4", None)] * 2     # NULLs skip
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {
        r.grp: r.heavy for r in any_heavy(df, ["grp"], "v").collect()
    }
    assert got == {"g1": "a", "g2": None, "g3": None, "g4": "m"}
    # NULL group key is its own group (CH GROUP BY)
    df2 = spark.createDataFrame(
        [(None, "z")] * 3 + [(None, "w")], "grp string, v string"
    )
    got = {r.grp: r.heavy for r in any_heavy(df2, ["grp"], "v").collect()}
    assert got == {None: "z"}


def test_group_concat(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import group_concat

    df = spark.createDataFrame(
        [("g", 3, "c"), ("g", 1, "a"), ("g", 2, "b"),
         ("g2", 1, None), ("g2", 2, None)],
        "grp string, o int, v string",
    )
    got = {
        r.grp: r.concat
        for r in group_concat(df, ["grp"], "v", "o", sep="-").collect()
    }
    # order_col order; all-NULL group keeps its key with ''
    assert got == {"g": "a-b-c", "g2": ""}


def test_group_array_sample(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_sample,
    )

    rows = [("g", i, float(i)) for i in range(50)] + [("e", 0, None)]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    out = {
        r.grp: r.sample
        for r in group_array_sample(
            df, ["grp"], "v", "id", max_size=5, seed=7
        ).collect()
    }
    assert len(out["g"]) == 5 and out["e"] == []
    # reproducible: same seed -> same sample; different seed differs
    again = {
        r.grp: r.sample
        for r in group_array_sample(
            df, ["grp"], "v", "id", max_size=5, seed=7
        ).collect()
    }
    assert again["g"] == out["g"]
    other = {
        r.grp: r.sample
        for r in group_array_sample(
            df, ["grp"], "v", "id", max_size=5, seed=8
        ).collect()
    }
    assert other["g"] != out["g"]
    # partitioning-independent: a repartitioned input samples the same
    rep = {
        r.grp: r.sample
        for r in group_array_sample(
            df.repartition(7), ["grp"], "v", "id", max_size=5, seed=7
        ).collect()
    }
    assert rep["g"] == out["g"]
    with pytest.raises(ValueError):
        group_array_sample(df, ["grp"], "v", "id", max_size=0)


def test_group_array_insert_at(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        group_array_insert_at,
    )

    df = spark.createDataFrame(
        [("g", 0, "a"), ("g", 2, "c"), ("g", 2, "b"),  # collision -> min
         ("g2", None, "x"),                            # NULL pos: no insert
         ("g3", 1, None)],                             # NULL value: no insert
        "grp string, pos int, v string",
    )
    got = {
        r.grp: r.slots
        for r in group_array_insert_at(
            df, ["grp"], "v", "pos", size=4, default="-"
        ).collect()
    }
    assert got == {
        "g": ["a", "-", "b", "-"],
        "g2": ["-", "-", "-", "-"],
        "g3": ["-", "-", "-", "-"],
    }
    bad = spark.createDataFrame([("g", 9, "a")], "grp string, pos int, v string")
    with pytest.raises(Exception):
        group_array_insert_at(
            bad, ["grp"], "v", "pos", size=4, default="-"
        ).collect()


def test_group_concat_limit(spark):
    from carbon_clickhouse_spark.operators.ch_aggregates import group_concat

    df = spark.createDataFrame(
        [("g", i, f"v{i}") for i in range(6)] + [("g", 99, None)],
        "grp string, o int, v string",
    )
    got = group_concat(df, ["grp"], "v", "o", sep=",", limit=3).collect()
    assert got[0].concat == "v0,v1,v2"
    with pytest.raises(ValueError):
        group_concat(df, ["grp"], "v", "o", limit=0)
