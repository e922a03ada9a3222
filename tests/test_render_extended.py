"""Round-5 render-function additions: the math transforms, percentile
filters, sorting/selection, grouping, interpolation, and generator
family graphite-web exposes beyond the round-4 vocabulary
(graphite-web render/functions.py is the public behavioral spec)."""

import math

import pytest

from carbon_clickhouse_spark.query import render
from carbon_clickhouse_spark.query.api import (
    GraphiteStore,
    evaluate_target,
    parse_target,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "path string, time long, value double")


def test_math_transforms(spark):
    s = _series(spark, [("m", 1, 4.0), ("m", 2, -9.0), ("m", 3, 0.25)])
    sq = {r.time: r.value for r in render.square_root(s).collect()}
    assert sq == {1: 2.0, 2: None, 3: 0.5}
    pw = {r.time: r.value for r in render.pow_values(s, 2).collect()}
    assert pw == {1: 16.0, 2: 81.0, 3: 0.0625}
    # non-integer exponent of a negative -> NULL gap, not NaN
    pw5 = {r.time: r.value for r in render.pow_values(s, 0.5).collect()}
    assert pw5[2] is None
    ex = {r.time: r.value for r in render.exp_values(s).collect()}
    assert ex[1] == pytest.approx(math.exp(4.0))
    sg = {r.time: r.value for r in render.sigmoid(s).collect()}
    assert sg[1] == pytest.approx(1 / (1 + math.exp(-4.0)))
    lg = {
        r.time: r.value
        for r in render.logit(
            _series(spark, [("m", 1, 0.25), ("m", 2, 1.0), ("m", 3, -0.5)])
        ).collect()
    }
    assert lg[1] == pytest.approx(math.log(0.25 / 0.75))
    assert lg[2] is None and lg[3] is None  # outside (0,1): null gap
    # logit inverts sigmoid
    back = render.logit(render.sigmoid(s))
    assert {r.time: r.value for r in back.collect()}[1] == pytest.approx(4.0)
    rd = {
        r.time: r.value
        for r in render.round_values(
            _series(spark, [("m", 1, 1.2345), ("m", 2, 1.5)]), 2
        ).collect()
    }
    assert rd == {1: 1.23, 2: 1.5}


def test_min_max(spark):
    s = _series(
        spark, [("m", 1, 10.0), ("m", 2, 20.0), ("m", 3, 15.0)]
    )
    mm = {r.time: r.value for r in render.min_max(s).collect()}
    assert mm == {1: 0.0, 2: 1.0, 3: 0.5}
    flat = _series(spark, [("f", 1, 7.0), ("f", 2, 7.0)])
    assert {r.value for r in render.min_max(flat).collect()} == {0.0}


def test_scale_to_seconds_and_hitcount(spark):
    # 10s step; values are per-interval counts
    s = _series(
        spark, [("m", 0, 5.0), ("m", 10, 10.0), ("m", 20, 20.0)]
    )
    r = {r.time: r.value for r in render.scale_to_seconds(s, 1).collect()}
    # value * 1 / 10 — first point borrows the following step
    assert r == {0: 0.5, 10: 1.0, 20: 2.0}
    hc = {r.time: r.value for r in render.hitcount(s, 60).collect()}
    # all three points in bucket 0: (5 + 10 + 20) * 10
    assert hc == {0: 350.0}


def test_smart_summarize_alignment(spark):
    s = _series(spark, [("m", 70, 1.0), ("m", 100, 2.0), ("m", 130, 4.0)])
    plain = {r.time: r.value for r in render.summarize(s, 60, "sum").collect()}
    assert plain == {60: 3.0, 120: 4.0}
    smart = {
        r.time: r.value
        for r in render.smart_summarize(s, 60, "sum", origin=70).collect()
    }
    # buckets [70, 130) and [130, 190)
    assert smart == {70: 3.0, 130: 4.0}


def test_lowest_and_filters(spark):
    s = _series(
        spark,
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 10.0), ("b", 2, 20.0),
         ("c", 1, 5.0), ("c", 2, 5.0)],
    )
    low = {r.path for r in render.lowest(s, 1, "avg").collect()}
    assert low == {"a"}
    lc = {r.path for r in render.lowest(s, 2, "current").collect()}
    assert lc == {"a", "c"}
    mb = {r.path for r in render.maximum_below(s, 6.0).collect()}
    assert mb == {"a", "c"}
    ma = {r.path for r in render.minimum_above(s, 2.0).collect()}
    assert ma == {"b", "c"}


def test_sort_by_stat(spark):
    s = _series(
        spark, [("a", 1, 1.0), ("b", 1, 10.0), ("c", 1, 5.0)]
    )
    order = [r.path for r in render.sort_by_stat(s, "total", True).collect()]
    assert order == ["b", "c", "a"]
    order = [r.path for r in render.sort_by_stat(s, "min", False).collect()]
    assert order == ["a", "c", "b"]


def test_percentile_family(spark):
    s = _series(
        spark,
        [("m", t, float(v)) for t, v in zip(range(1, 6), (1, 2, 3, 4, 100))],
    )
    # graphite's rank-based _getPercentile (r12): k=5, n=80 ->
    # fractionalRank 4.8 -> rank 5 -> sorted[4] = 100, so the 100 is
    # NOT above its own percentile and survives (the interpolated
    # form returned 23.2 and nulled it — an upstream deviation)
    above = {r.time: r.value for r in
             render.remove_above_percentile(s, 80).collect()}
    assert above[5] == 100.0 and above[1] == 1.0
    above60 = {r.time: r.value for r in
               render.remove_above_percentile(s, 60).collect()}
    assert above60[5] is None and above60[4] == 4.0  # pv = sorted[3]
    below = {r.time: r.value for r in
             render.remove_below_percentile(s, 40).collect()}
    assert below[1] is None and below[5] == 100.0
    two = _series(spark, [("a", 1, 1.0), ("b", 1, 3.0), ("c", 1, 5.0)])
    med = render.percentile_of_series(two, 50).collect()
    assert med[0].value == 3.0 and med[0].path == "percentileOfSeries"
    sd = render.stddev_series(two).collect()
    assert sd[0].value == pytest.approx(math.sqrt(8 / 3))


def test_substr_and_alias_by_metric(spark):
    s = _series(spark, [("a.b.c.d", 1, 1.0)])
    assert render.substr_path(s, 1, 3).collect()[0].path == "b.c"
    assert render.substr_path(s, 2).collect()[0].path == "c.d"
    assert render.substr_path(s, -1).collect()[0].path == "d"
    assert render.substr_path(s, 0, -2).collect()[0].path == "a.b"
    assert render.alias_by_metric(s).collect()[0].path == "d"


def test_interpolate(spark):
    s = _series(
        spark,
        [("m", 1, None), ("m", 2, 10.0), ("m", 3, None), ("m", 4, None),
         ("m", 5, 40.0), ("m", 6, None)],
    )
    out = {r.time: r.value for r in render.interpolate(s).collect()}
    # leading/trailing stay NULL; interior gap filled linearly
    assert out == {1: None, 2: 10.0, 3: 20.0, 4: 30.0, 5: 40.0, 6: None}
    lim = {r.time: r.value for r in render.interpolate(s, 1).collect()}
    assert lim[3] is None and lim[4] is None  # gap of 2 > limit 1


def test_aggregate_series(spark):
    s = _series(
        spark,
        [("a", 1, 1.0), ("b", 1, 2.0), ("c", 1, 4.0),
         ("a", 2, 2.0), ("b", 2, 2.0)],
    )
    med = {r.time: r.value for r in
           render.aggregate_series(s, "median").collect()}
    assert med == {1: 2.0, 2: 2.0}
    cnt = {r.time: r.value for r in
           render.aggregate_series(s, "count").collect()}
    assert cnt == {1: 3.0, 2: 2.0}
    rng = {r.time: r.value for r in
           render.aggregate_series(s, "range").collect()}
    assert rng == {1: 3.0, 2: 0.0}
    mul = {r.time: r.value for r in
           render.aggregate_series(s, "multiply").collect()}
    assert mul == {1: 8.0, 2: 4.0}
    last = {r.time: r.value for r in
            render.aggregate_series(s, "last").collect()}
    assert last == {1: 4.0, 2: 2.0}  # lexically-last series present
    tot = render.aggregate_series(s, "total").collect()
    assert {r.path for r in tot} == {"totalSeries"}
    assert {r.time: r.value for r in tot} == {1: 7.0, 2: 4.0}


def test_group_by_nodes_and_tags(spark):
    s = _series(
        spark,
        [("dc1.h1.cpu", 1, 1.0), ("dc1.h2.cpu", 1, 3.0),
         ("dc2.h1.cpu", 1, 10.0)],
    )
    out = {r.path: r.value for r in
           render.group_by_nodes(s, "sum", 0, 2).collect()}
    assert out == {"dc1.cpu": 4.0, "dc2.cpu": 10.0}
    t = _series(
        spark,
        [("cpu?dc=east&host=h1", 1, 1.0), ("cpu?dc=east&host=h2", 1, 3.0),
         ("cpu?dc=west&host=h1", 1, 10.0)],
    )
    out = {r.path: r.value for r in
           render.group_by_tags(t, "avg", "name", "dc").collect()}
    assert out == {"cpu.east": 2.0, "cpu.west": 10.0}


def _store(spark):
    # tree-level index rows (level = depth + TREE_LEVEL_OFFSET)
    idx = spark.createDataFrame(
        [("ev.a", 20002), ("ev.b", 20002)], "path string, level int"
    )
    pts = _series(
        spark,
        [("ev.a", 100, 1.0), ("ev.a", 160, 3.0),
         ("ev.b", 100, 10.0), ("ev.b", 160, 30.0)],
    )
    return GraphiteStore(idx, pts)


def test_facade_generators_and_dispatch(spark):
    store = _store(spark)
    cl = evaluate_target(parse_target("constantLine(5)"), store, 0, 100)
    rows = cl.collect()
    assert [r.value for r in rows] == [5.0, 5.0, 5.0]
    assert [r.time for r in rows] == [0, 50, 100]
    th = evaluate_target(
        parse_target("threshold(9, 'limit')"), store, 0, 100
    ).collect()
    assert th[0].path == "limit" and th[0].value == 9.0
    tf = evaluate_target(parse_target("time('t', 30)"), store, 0, 90).collect()
    assert [r.value for r in tf] == [0.0, 30.0, 60.0, 90.0]
    # consolidateBy records the hint and passes data through
    ctx: dict = {}
    out = evaluate_target(
        parse_target("consolidateBy(ev.a, 'max')"), store, 0, 200, ctx
    )
    assert ctx["consolidate"] == "max"
    assert out.count() == 2
    # smartSummarize aligns buckets to from (100), not the epoch grid
    sm = evaluate_target(
        parse_target("smartSummarize(ev.a, '1min', 'sum')"), store, 100, 200
    ).collect()
    assert {r.time: r.value for r in sm} == {100: 1.0, 160: 3.0}
    # fallbackSeries: empty primary -> secondary
    fb = evaluate_target(
        parse_target("fallbackSeries(ev.nothing, ev.b)"), store, 0, 200
    )
    assert {r.path for r in fb.collect()} == {"ev.b"}
    # presentation no-ops pass through unchanged
    noop = evaluate_target(
        parse_target("lineWidth(color(ev.a, 'blue'), 2)"), store, 0, 200
    )
    assert noop.count() == 2


def test_facade_new_function_registry(spark):
    store = _store(spark)
    for target, expect in [
        ("squareRoot(ev.a)", {1.0, math.sqrt(3.0)}),
        ("aggregate(ev.*, 'median')", {5.5, 16.5}),
        ("aliasByMetric(ev.a)", None),
        ("sortByTotal(ev.*)", None),
        ("hitcount(ev.a, '1min')", None),
        ("groupByNodes(ev.*, 'sum', 0)", {11.0, 33.0}),
    ]:
        df = evaluate_target(parse_target(target), store, 0, 200)
        vals = {r.value for r in df.collect()}
        if expect is not None:
            assert vals == expect, target


def test_linear_regression_series(spark):
    s = _series(spark, [("m", t, 2.0 * t + 1.0) for t in (10, 20, 30)])
    out = {r.time: r.value for r in
           render.linear_regression_series(s).collect()}
    assert out[10] == pytest.approx(21.0)
    assert out[30] == pytest.approx(61.0)


def test_percentile_band_selection(spark):
    rows = []
    for i, base in enumerate((1.0, 2.0, 3.0, 4.0, 100.0)):
        rows += [(f"s{i}", t, base) for t in (1, 2)]
    s = _series(spark, rows)
    # graphite keeps boundary averages, with the rank-based
    # _getPercentile (r12): over (1,2,3,4,100), p25 -> fr 1.5 ->
    # rank 2 -> 2; p75 -> fr 4.5 -> rank 5 -> 100. Band (2, 100)
    # OPEN: 1, 2 and 100 survive; 3 and 4 are inside
    out = {r.path for r in
           render.average_outside_percentile(s, 75).collect()}
    assert out == {"s0", "s1", "s4"}
    rb = {r.path for r in
          render.remove_between_percentile(s, 75).collect()}
    assert rb == {"s0", "s1", "s4"}


def test_time_stack(spark):
    store = _store(spark)
    out = evaluate_target(
        parse_target("timeStack(ev.a, '1min', 0, 2)"), store, 160, 220
    ).collect()
    got = {(r.path, r.time, r.value) for r in out}
    # i=0: window [160,220] -> point 160 (3.0); i=1: window [100,160]
    # -> points 100 (1.0) and 160 (3.0), shifted forward 60s
    assert got == {
        ("timeShift(ev.a,1min,0)", 160, 3.0),
        ("timeShift(ev.a,1min,1)", 160, 1.0),
        ("timeShift(ev.a,1min,1)", 220, 3.0),
    }


def test_cacti_style_and_aggregate_line(spark):
    s = _series(spark, [("m", 1, 1.0), ("m", 2, 3.0)])
    lab = render.cacti_style(s).collect()[0].path
    assert lab == "m Current:3.00 Max:3.00 Min:1.00"
    # graphite uses %.2f — no thousands separators
    big = _series(spark, [("m", 1, 1234.5)])
    assert render.cacti_style(big).collect()[0].path == (
        "m Current:1234.50 Max:1234.50 Min:1234.50"
    )
    # graphite-web 1.1 names the line with the %g-formatted VALUE
    al = render.aggregate_line(s, "avg").collect()
    assert {r.path for r in al} == {"aggregateLine(m, 2)"}
    assert {r.value for r in al} == {2.0}


def test_weighted_average(spark):
    avg = _series(
        spark,
        [("h1.cpu.avg", 1, 10.0), ("h2.cpu.avg", 1, 20.0)],
    )
    wt = _series(
        spark,
        [("h1.cpu.weight", 1, 1.0), ("h2.cpu.weight", 1, 3.0)],
    )
    out = render.weighted_average(avg, wt, 0).collect()
    # one combined series: sum(avg*w) / sum(w) over the host pairs
    assert len(out) == 1 and out[0].path == "weightedAverage"
    assert out[0].value == pytest.approx((10 * 1 + 20 * 3) / 4)


def test_render_invariants_random_series(spark):
    """Invariant sweep over a seeded random multi-series input (nulls
    included): interpolate preserves known points and fills inside the
    neighbor envelope; minMax stays in [0,1]; substr matches the
    Python slice; grouped sums are conserved."""
    import random

    rng = random.Random(42)
    rows = []
    for s in range(6):
        path = f"a{s}.b{s % 3}.c{s % 2}.d"
        for t in range(40):
            v = None if rng.random() < 0.25 else round(
                rng.uniform(-100, 100), 3
            )
            rows.append((path, t * 10, v))
    s = _series(spark, rows)
    src = {(r[0], r[1]): r[2] for r in rows}

    out = render.interpolate(s).collect()
    by_path = {}
    for p, t in src:
        by_path.setdefault(p, []).append(t)
    for r in out:
        orig = src[(r.path, r.time)]
        if orig is not None:
            assert r.value == orig
        elif r.value is not None:
            ts = sorted(by_path[r.path])
            known = [(t, src[(r.path, t)]) for t in ts
                     if src[(r.path, t)] is not None]
            prev = max((kv for kv in known if kv[0] < r.time),
                       default=None)
            nxt = min((kv for kv in known if kv[0] > r.time),
                      default=None)
            assert prev and nxt  # interior gap only
            lo, hi = sorted((prev[1], nxt[1]))
            assert lo - 1e-9 <= r.value <= hi + 1e-9

    mm = render.min_max(s).collect()
    for r in mm:
        assert r.value is None or -1e-12 <= r.value <= 1 + 1e-12

    sub = render.substr_path(s, 1, 3).collect()
    for r in sub:
        assert r.path in {"b0.c0", "b1.c1", "b2.c0", "b0.c1", "b1.c0",
                          "b2.c1"}

    # groupByNodes(sum) conserves the total of non-null values
    tot_in = sum(v for v in src.values() if v is not None)
    gb = render.group_by_nodes(s, "sum", 1).collect()
    tot_out = sum(r.value for r in gb if r.value is not None)
    assert abs(tot_in - tot_out) < 1e-6


def test_hitcount_end_aligned_via_facade(spark):
    """Through the facade, hitcount buckets anchor at the request end
    like graphite-web (not the epoch grid)."""
    store = _store(spark)
    out = evaluate_target(
        parse_target("hitcount(ev.a, '1min')"), store, 70, 190
    ).collect()
    got = {r.time: r.value for r in out}
    # ev.a: (100, 1.0), (160, 3.0), step 60; buckets end at 190:
    # [70,130) holds 100 -> 60, [130,190) holds 160 -> 180
    assert got == {70: 60.0, 130: 180.0}


def test_holt_winters_family(spark):
    """Seasonal Holt-Winters: on a perfectly periodic signal the
    forecast converges to the signal, the confidence band brackets
    it, and aberration is 0 inside the band."""
    import math

    rows = []
    for i in range(480):  # 8 "days" of 60 points at 10s season
        v = 10.0 + 5.0 * math.sin(2 * math.pi * (i % 60) / 60)
        rows.append(("m", i * 10, round(v, 4)))
    s = _series(spark, rows)
    hw = render.holt_winters(s, season_s=600).collect()
    by_t = {r.time: r for r in hw}
    # the seasonal term converges at (1-gamma) per season — slow at
    # graphite's defaults: season 8's error must sit well below
    # season 2's and below the signal amplitude
    def mean_err(lo, hi):
        xs = [abs(r.forecast - r.value) for r in hw if lo <= r.time < hi]
        return sum(xs) / len(xs)

    assert mean_err(4200, 4800) < 0.85 * mean_err(600, 1200) < 5.0
    assert all(r.deviation >= 0 for r in hw if r.time >= 1800)
    late = [r for r in hw if r.time >= 1800]

    bands = render.holt_winters_confidence_bands(s, 3.0, 600).collect()
    up = {r.time: r.value for r in bands
          if r.path.startswith("holtWintersConfidenceUpper")}
    lo = {r.time: r.value for r in bands
          if r.path.startswith("holtWintersConfidenceLower")}
    ts = range(1800, 4800, 10)
    cover = sum(
        1 for t in ts if lo[t] - 1e-6 <= by_t[t].value <= up[t] + 1e-6
    )
    assert cover >= 0.8 * len(ts)  # band may clip extremes while converging

    ab = render.holt_winters_aberration(s, 3.0, 600).collect()
    late_ab = [r.value for r in ab if r.time >= 1800]
    # periodic signal stays inside the 3-deviation band mostly
    inside = sum(1 for v in late_ab if v == 0.0)
    assert inside >= len(late_ab) * 0.8


def test_holt_winters_bootstrap_trim(spark):
    """The facade bootstraps on pre-window history and trims the
    response to the requested window."""
    store = _store(spark)
    out = evaluate_target(
        parse_target("holtWintersForecast(ev.a)"), store, 160, 220
    ).collect()
    assert {r.time for r in out} <= {160, 220}
    assert all(r.path == "holtWintersForecast(ev.a)" for r in out)


def test_divide_series_lists_and_apply_by_node(spark):
    store = _store(spark)
    out = evaluate_target(
        parse_target("divideSeriesLists(ev.a, ev.b)"), store, 0, 200
    ).collect()
    got = {r.time: r.value for r in out}
    assert got == {100: 0.1, 160: 0.1}
    assert out[0].path == "divideSeries(ev.a,ev.b)"

    ab = evaluate_target(
        parse_target("applyByNode(ev.*, 1, 'sumSeries(%)')"),
        store, 0, 200,
    ).collect()
    # one sumSeries evaluation per node-1 prefix (ev.a, ev.b)
    assert len(ab) == 4
    vals = sorted(r.value for r in ab)
    assert vals == [1.0, 3.0, 10.0, 30.0]


def test_map_reduce_series(spark):
    """reduceSeries over mapSeries groups: the disk-ratio idiom."""
    idx = spark.createDataFrame(
        [("disk.h1.used", 20003), ("disk.h1.total", 20003),
         ("disk.h2.used", 20003), ("disk.h2.total", 20003)],
        "path string, level int",
    )
    pts = _series(
        spark,
        [("disk.h1.used", 100, 30.0), ("disk.h1.total", 100, 100.0),
         ("disk.h2.used", 100, 10.0), ("disk.h2.total", 100, 40.0)],
    )
    store = GraphiteStore(idx, pts)
    out = evaluate_target(
        parse_target(
            "reduceSeries(mapSeries(disk.*.*, 1), "
            "'asPercent', 2, 'used', 'total')"
        ),
        store, 0, 200,
    ).collect()
    got = {r.path: r.value for r in out}
    # functions.rst: results alias to <prefix>.reduce.<function>
    assert got == {
        "disk.h1.reduce.asPercent": 30.0,
        "disk.h2.reduce.asPercent": 25.0,
    }


def test_variadic_series_args(spark):
    # graphite's (*seriesLists) signature: args union before combining
    store = _store(spark)
    s = evaluate_target(
        parse_target("sumSeries(ev.a, ev.b)"), store, 0, 200
    )
    assert {r.time: r.value for r in s.collect()} == {100: 11.0, 160: 33.0}
    g = evaluate_target(parse_target("group(ev.a, ev.b)"), store, 0, 200)
    assert g.count() == 4
    u = evaluate_target(parse_target("unique(ev.a, ev.a)"), store, 0, 200)
    assert u.count() == 2


def test_pow_series(spark):
    store = _store(spark)
    out = evaluate_target(parse_target("powSeries(ev.a, ev.b)"), store, 0, 200)
    got = {r.time: r.value for r in out.collect()}
    # fold in sorted-path order: ev.a ** ev.b
    assert got == {100: 1.0**10.0, 160: 3.0**30.0}


def test_filter_series_and_remove_empty(spark):
    store = _store(spark)
    kept = evaluate_target(
        parse_target("filterSeries(ev.*, 'max', '>', 5)"), store, 0, 200
    )
    assert {r.path for r in kept.collect()} == {"ev.b"}
    eq = evaluate_target(
        parse_target("filterSeries(ev.*, 'current', '=', 30)"), store, 0, 200
    )
    assert {r.path for r in eq.collect()} == {"ev.b"}
    s = _series(spark, [("m.a", 1, 1.0), ("m.b", 1, None), ("m.b", 2, None)])
    left = render.remove_empty_series(s)
    assert {r.path for r in left.collect()} == {"m.a"}
    # factor 0.6: m.c has 1/2 non-null -> dropped
    s2 = _series(
        spark, [("m.a", 1, 1.0), ("m.c", 1, 1.0), ("m.c", 2, None)]
    )
    strict = render.remove_empty_series(s2, 0.6)
    assert {r.path for r in strict.collect()} == {"m.a"}


def test_sort_by_and_generic_selectors(spark):
    store = _store(spark)
    first = evaluate_target(
        parse_target("sortBy(ev.*, 'max', true)"), store, 0, 200
    ).collect()[0]
    assert first.path == "ev.b"
    hi = evaluate_target(parse_target("highest(ev.*, 1, 'max')"), store, 0, 200)
    assert {r.path for r in hi.collect()} == {"ev.b"}
    lo = evaluate_target(
        parse_target("lowest(ev.*, 1, 'average')"), store, 0, 200
    )
    assert {r.path for r in lo.collect()} == {"ev.a"}


def test_legend_value(spark):
    store = _store(spark)
    out = evaluate_target(
        parse_target("legendValue(ev.a, 'max')"), store, 0, 200
    )
    assert {r.path for r in out.collect()} == {"ev.a (max: 3.0)"}
    unk = evaluate_target(
        parse_target("legendValue(ev.a, 'bogus')"), store, 0, 200
    )
    assert {r.path for r in unk.collect()} == {"ev.a (bogus: None)"}


def test_aggregate_series_lists(spark):
    store = _store(spark)
    d = evaluate_target(
        parse_target("diffSeriesLists(ev.a, ev.b)"), store, 0, 200
    )
    rows = d.collect()
    assert {r.path for r in rows} == {"diffSeries(ev.a,ev.b)"}
    assert {r.time: r.value for r in rows} == {100: -9.0, 160: -27.0}
    s = evaluate_target(
        parse_target("sumSeriesLists(ev.a, ev.b)"), store, 0, 200
    )
    assert {r.time: r.value for r in s.collect()} == {100: 11.0, 160: 33.0}
    m = evaluate_target(
        parse_target("aggregateSeriesLists(ev.a, ev.b, 'max')"), store, 0, 200
    )
    assert {r.time: r.value for r in m.collect()} == {100: 10.0, 160: 30.0}


def test_generator_functions(spark):
    store = _store(spark)
    sf = evaluate_target(
        parse_target("sinFunction('s', 2, 30)"), store, 0, 90
    ).collect()
    assert [r.time for r in sf] == [0, 30, 60, 90]
    assert sf[1].value == pytest.approx(2 * math.sin(30.0))
    # random walk: deterministic across evaluations, bounded steps
    w1 = evaluate_target(
        parse_target("randomWalkFunction('w', 30)"), store, 0, 300
    ).collect()
    w2 = evaluate_target(
        parse_target("randomWalkFunction('w', 30)"), store, 0, 300
    ).collect()
    assert [r.value for r in w1] == [r.value for r in w2]
    assert all(abs(r.value) <= 0.5 * len(w1) for r in w1)
    vl = evaluate_target(
        parse_target("verticalLine('50', 'event')"), store, 0, 100
    ).collect()
    assert [(r.path, r.time, r.value) for r in vl] == [
        ("event", 50, 1.0), ("event", 50, 1.0)
    ]
    with pytest.raises(ValueError):
        evaluate_target(parse_target("verticalLine('500')"), store, 0, 100)


def test_use_series_above_and_alias_query(spark):
    store = _store(spark)
    # ev.a max is 3 > 0.5 -> substitute a$ -> b, fetch ev.b
    out = evaluate_target(
        parse_target("useSeriesAbove(ev.a, 0.5, 'a$', 'b')"), store, 0, 200
    )
    assert {r.path for r in out.collect()} == {"ev.b"}
    none = evaluate_target(
        parse_target("useSeriesAbove(ev.a, 99, 'a$', 'b')"), store, 0, 200
    )
    assert none.count() == 0
    aq = evaluate_target(
        parse_target("aliasQuery(ev.a, 'a$', 'b', 'last %d')"), store, 0, 200
    )
    assert {r.path for r in aq.collect()} == {"last 30"}


def test_consolidation_hints(spark):
    store = _store(spark)
    ctx: dict = {}
    out = evaluate_target(
        parse_target("cumulative(ev.a)"), store, 0, 200, ctx
    )
    assert ctx["consolidate"] == "sum" and out.count() == 2
    ctx2: dict = {}
    out2 = evaluate_target(
        parse_target("setXFilesFactor(ev.a, 0.5)"), store, 0, 200, ctx2
    )
    assert ctx2["xFilesFactor"] == 0.5 and out2.count() == 2


def test_holt_winters_confidence_area_dispatch(spark):
    store = _store(spark)
    area = evaluate_target(
        parse_target("holtWintersConfidenceArea(ev.a, 3, '100s')"),
        store, 0, 200,
    )
    names = {r.path.split("(")[0] for r in area.collect()}
    assert names == {"holtWintersConfidenceUpper", "holtWintersConfidenceLower"}


def test_most_deviant_and_multiply_wildcards(spark):
    s = _series(
        spark,
        [("a.x", 1, 1.0), ("a.x", 2, 1.0),      # variance 0
         ("a.y", 1, 0.0), ("a.y", 2, 10.0),     # variance 25
         ("a.z", 1, 5.0), ("a.z", 2, 6.0)],     # variance 0.25
    )
    top = render.most_deviant(s, 1)
    assert {r.path for r in top.collect()} == {"a.y"}
    m = render.combine_with_wildcards(s, "multiply", 1)
    got = {r.time: r.value for r in m.collect()}
    assert got == {1: 0.0, 2: 60.0}
    store = _store(spark)
    via = evaluate_target(
        parse_target("multiplySeriesWithWildcards(ev.*, 1)"), store, 0, 200
    )
    assert {r.time: r.value for r in via.collect()} == {100: 10.0, 160: 90.0}


def test_alias_query_single_job_and_series_ceiling(spark):
    """aliasQuery resolves every sub-query's last value in ONE
    max_by-GROUP BY job (plus the path-listing job), not one
    limit(1).collect() per series; and the driver-loop functions error
    past MAX_DRIVER_SERIES instead of launching unbounded jobs."""
    from carbon_clickhouse_spark.query import api as api_mod

    n = 8
    rows, idx = [], []
    for i in range(n):
        rows += [(f"ev.m{i}", 100, float(i)), (f"ev.m{i}", 160, float(i + 1))]
        rows += [(f"qq.m{i}", 100, float(10 * i)), (f"qq.m{i}", 160, float(10 * i + 5))]
        idx += [(f"ev.m{i}", 20002), (f"qq.m{i}", 20002)]
    store = GraphiteStore(
        spark.createDataFrame(idx, "path string, level int"),
        _series(spark, rows),
    )
    sc = spark.sparkContext
    sc.setJobGroup("aliasq-count", "job-count assert")
    try:
        out = evaluate_target(
            parse_target("aliasQuery(ev.*, '^ev', 'qq', 'q %d')"),
            store, 0, 200,
        )
        labels = {r.path for r in out.collect()}
    finally:
        sc.setJobGroup("", "")
    assert labels == {f"q {10 * i + 5}" for i in range(n)}
    jobs = sc.statusTracker().getJobIdsForGroup("aliasq-count")
    # paths-listing + one last-value aggregation + the final collect
    # (AQE splits a collect into a few jobs): constant in n — the old
    # per-series loop ran >= n+2 jobs, so n=8 would exceed this bound
    assert len(jobs) <= 8, jobs

    old = api_mod.MAX_DRIVER_SERIES
    api_mod.MAX_DRIVER_SERIES = 3
    try:
        with pytest.raises(ValueError, match="max-series ceiling"):
            evaluate_target(
                parse_target("aliasQuery(ev.*, '^ev', 'qq', 'q %d')"),
                store, 0, 200,
            )
        with pytest.raises(ValueError, match="max-series ceiling"):
            evaluate_target(
                parse_target("useSeriesAbove(ev.*, -1, '^ev', 'qq')"),
                store, 0, 200,
            )
        with pytest.raises(ValueError, match="max-series ceiling"):
            evaluate_target(
                parse_target("applyByNode(ev.*, 1, 'sumSeries(%)')"),
                store, 0, 200,
            )
    finally:
        api_mod.MAX_DRIVER_SERIES = old


def test_round_function_alias_and_compress_periodic_gaps(spark):
    """graphite-web's internal-name alias roundFunction and
    compressPeriodicGaps (gap rows dropped; the response regularizer
    re-derives step from the surviving points)."""
    store = _store(spark)
    out = evaluate_target(
        parse_target("roundFunction(scale(ev.a, 1.04), 1)"), store, 0, 200
    ).collect()
    assert sorted(r.value for r in out) == [1.0, 3.1]
    # a series with a periodic hole: transformNull puts explicit nulls
    # in, compressPeriodicGaps must take them back out
    gap = evaluate_target(
        parse_target("compressPeriodicGaps(transformNull(ev.a, 7))"),
        store, 0, 200,
    ).collect()
    assert all(r.value is not None for r in gap)
    assert {r.time for r in gap} == {100, 160}


def test_format_g_matches_c_printf(spark):
    """render.format_g is the JVM-side twin of C/Python '%g'
    (graphite-web formats computed values into legend names with it:
    aggregateLine's 'aggregateLine(%s, %g)'). Seeded fuzz across the
    fixed/scientific boundary plus the documented edge shapes."""
    import random

    rng = random.Random(0xC0FFEE)
    vals = [
        0.0, -0.0, 1.0, -1.0, 4.2, 10.0, 0.5, 2.0 / 3.0,
        0.0001, 0.00001, -0.00001, 100000.0, 999999.0, 1000000.0,
        123456.0, 1234567.0, -1234567.89, 1.5e-7, 3.25e12,
        float("inf"), float("-inf"),
        # full double range incl. subnormals and DBL_MAX (r12: the
        # scale division underflowed below ~1e-320, and 3-digit
        # exponents were lpad-truncated)
        1e300, -1e300, 1.7976931348623157e308, 1e-308, 5e-324,
        2.2250738585072014e-308, 1e100, -3.7e-200, 2.5e-310,
    ]
    for _ in range(400):
        vals.append(rng.uniform(-10, 10))
        vals.append(rng.uniform(-1e8, 1e8))
        vals.append(rng.uniform(-1, 1) * 10 ** rng.randint(-12, 12))
    for _ in range(100):
        vals.append(rng.uniform(-1, 1) * 10 ** rng.randint(-320, 307))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.s
        for r in df.select(render.format_g(df["v"]).alias("s")).collect()
    ]
    want = ["%g" % v for v in vals]
    mismatches = [
        (v, g, w) for v, g, w in zip(vals, got, want) if g != w
    ]
    assert not mismatches, mismatches[:10]
