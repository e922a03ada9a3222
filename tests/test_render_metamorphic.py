"""Metamorphic render-function invariants (r12): algebraic identities
that must hold for ANY input, checked over seeded random stores —
the complement of the doc-citation goldens (which pin hand-worked
values on fixed inputs). Each invariant is derived from the
function definitions alone, so a dispatch/arg-parsing/window bug
that happens to preserve the golden fixtures still fails here.

All comparisons drive parse_target + evaluate_target (the user
surface), exact equality unless the identity itself crosses a float
boundary (noted inline)."""

import math
import random

import pytest

from carbon_clickhouse_spark.pipeline import IngestConfig, derive_tables
from carbon_clickhouse_spark.query.api import (
    GraphiteStore,
    evaluate_target,
    parse_target,
)
from carbon_clickhouse_spark.sources.plain import parse_plain_lines

BASE = 1_625_478_000
N = 8  # points per series


def _mkstore(spark, seed):
    rng = random.Random(seed)
    lines = []
    for name in ("m.a", "m.b"):
        for i in range(N):
            v = round(rng.uniform(-50, 50), 3)
            lines.append(f"{name} {v} {BASE + 60 * i}")
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    pts = parse_plain_lines(df, now=BASE)
    t = derive_tables(pts, IngestConfig(now=BASE + 3600))
    return GraphiteStore(t["index"].cache(), t["points"].cache())


@pytest.fixture(scope="module", params=[11, 29, 47])
def rstore(request, spark):
    return _mkstore(spark, request.param)


def _vals(store, target, t0=BASE, t1=BASE + 60 * (N - 1)):
    out = evaluate_target(parse_target(target), store, t0, t1).collect()
    d = {}
    for r in out:
        d.setdefault(r.path, {})[r.time] = r.value
    return d


def _flat(series_map):
    # single-series result -> {time: value}
    assert len(series_map) == 1, series_map.keys()
    return next(iter(series_map.values()))


def _eq(a, b, tol=0.0):
    assert set(a) == set(b)
    for t in a:
        x, y = a[t], b[t]
        if x is None or y is None:
            assert x is None and y is None, (t, x, y)
        elif tol:
            assert x == pytest.approx(y, abs=tol), (t, x, y)
        else:
            assert x == y, (t, x, y)


def test_scale_distributes_over_sum(rstore):
    """scale(sumSeries(a, b), k) == sumSeries(scale(a,k), scale(b,k))
    — scaling is linear; exact because both sides run the same
    decimal sum then one IEEE multiply per point."""
    lhs = _flat(_vals(rstore, "scale(sumSeries(m.a, m.b), 2.5)"))
    rhs = _flat(
        _vals(rstore, "sumSeries(scale(m.a, 2.5), scale(m.b, 2.5))")
    )
    # rounding order differs by one multiply: allow 1 ulp-ish slack
    _eq(lhs, rhs, tol=1e-9)


def test_derivative_inverts_integral(rstore):
    """derivative(integral(s)) == s except the first point (doc:
    'the first datapoint will be null') — the defining property pair
    of the two functions."""
    got = _flat(_vals(rstore, "derivative(integral(m.a))"))
    want = _flat(_vals(rstore, "m.a"))
    assert got[BASE] is None
    for t in want:
        if t != BASE:
            assert got[t] == pytest.approx(want[t], abs=1e-9), t


def test_offset_roundtrip(rstore):
    """offset(offset(s, c), -c) == s up to one IEEE rounding step
    (x + c - c re-rounds at c's exponent)."""
    got = _flat(_vals(rstore, "offset(offset(m.a, 17.25), -17.25)"))
    want = _flat(_vals(rstore, "m.a"))
    _eq(got, want, tol=1e-12)


def test_invert_involution(rstore):
    """invert(invert(s)) == s up to float round-trip (1/(1/x));
    values are bounded away from 0 by the fixture's 3-decimal grid
    only probabilistically, so zero values are skipped."""
    got = _flat(_vals(rstore, "invert(invert(m.a))"))
    want = _flat(_vals(rstore, "m.a"))
    for t in want:
        if want[t] not in (None, 0.0):
            assert got[t] == pytest.approx(want[t], rel=1e-12), t


def test_absolute_idempotent_and_nonnegative(rstore):
    """absolute(absolute(s)) == absolute(s), and every value >= 0."""
    one = _flat(_vals(rstore, "absolute(m.a)"))
    two = _flat(_vals(rstore, "absolute(absolute(m.a))"))
    _eq(one, two)
    assert all(v >= 0 for v in one.values() if v is not None)


def test_sort_preserves_points(rstore):
    """sortByMaxima/sortByName reorder SERIES only — the (path, time,
    value) point multiset must be exactly the input's."""
    want = _vals(rstore, "m.*")
    for fn in ("sortByMaxima", "sortByName", "sortByTotal"):
        got = _vals(rstore, f"{fn}(m.*)")
        assert got == want, fn


def test_max_min_series_envelope(rstore):
    """minSeries <= averageSeries <= maxSeries pointwise, and
    sumSeries == averageSeries * 2 when both series are present
    (exact: both run the same decimal sum)."""
    mx = _flat(_vals(rstore, "maxSeries(m.a, m.b)"))
    mn = _flat(_vals(rstore, "minSeries(m.a, m.b)"))
    av = _flat(_vals(rstore, "averageSeries(m.a, m.b)"))
    sm = _flat(_vals(rstore, "sumSeries(m.a, m.b)"))
    for t in mx:
        assert mn[t] <= av[t] <= mx[t], t
        assert sm[t] == pytest.approx(2 * av[t], abs=1e-9), t


def test_time_shift_roundtrip_interior(rstore):
    """timeShift(timeShift(s, '-1min'), '+1min') == s on the
    interior of the window (the edges fetch shifted ranges)."""
    got = _flat(
        _vals(rstore, "timeShift(timeShift(m.a, '-1min'), '+1min')")
    )
    want = _flat(_vals(rstore, "m.a"))
    for t in want:
        if BASE + 60 <= t <= BASE + 60 * (N - 2):
            assert got.get(t) == want[t], t


def test_n_percentile_100_is_max(rstore):
    """nPercentile(s, 100) == the series max at every point (the
    rank-based percentile at n=100 selects sorted[k])."""
    got = _flat(_vals(rstore, "nPercentile(m.a, 100)"))
    want = max(v for v in _flat(_vals(rstore, "m.a")).values())
    assert set(got.values()) == {want}


def test_transform_null_then_keep_last_identity(rstore):
    """keepLastValue over a gap-free series is the identity — and
    transformNull makes any series gap-free first."""
    base = _flat(_vals(rstore, "transformNull(m.a, 7)"))
    got = _flat(_vals(rstore, "keepLastValue(transformNull(m.a, 7))"))
    _eq(got, base)


def test_logit_sigmoid_roundtrip(rstore):
    """logit(sigmoid(s)) ~= s (float tolerance — two transcendental
    evaluations); sigmoid maps into (0,1) so logit's domain gap
    never fires."""
    got = _flat(_vals(rstore, "logit(sigmoid(scale(m.a, 0.1)))"))
    want = _flat(_vals(rstore, "scale(m.a, 0.1)"))
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-6), t


def test_group_identity(rstore):
    """group(m.a, m.b) == m.* — grouping is a union, never a
    transform."""
    assert _vals(rstore, "group(m.a, m.b)") == _vals(rstore, "m.*")


def test_as_percent_of_total_sums_to_hundred(rstore):
    """asPercent(a, sumSeries(a, b)) + asPercent(b, sumSeries(a, b))
    == 100 at every point where the total is nonzero — ties asPercent
    division to the combiner it normalizes by."""
    pa = _flat(_vals(rstore, "asPercent(m.a, sumSeries(m.a, m.b))"))
    pb = _flat(_vals(rstore, "asPercent(m.b, sumSeries(m.a, m.b))"))
    tot = _flat(_vals(rstore, "sumSeries(m.a, m.b)"))
    for t in tot:
        if tot[t] not in (None, 0.0):
            assert pa[t] + pb[t] == pytest.approx(100.0, abs=1e-6), t


def test_summarize_whole_window_equals_aggregate(rstore):
    """summarize over one bucket spanning the whole request ==
    the series total — ties bucketing to plain aggregation."""
    got = _vals(rstore, "summarize(m.a, '1hour', 'sum')")
    vals = [v for d in got.values() for v in d.values()]
    assert len(vals) == 1
    want = sum(_flat(_vals(rstore, "m.a")).values())
    assert vals[0] == pytest.approx(want, abs=1e-9)


def test_moving_sum_average_consistency(rstore):
    """movingSum(s, n) == movingAverage(s, n) * (points in window):
    the shared movingWindow machinery must agree between its
    aggregators. With a gap-free series the window holds min(i, n)
    points at index i."""
    ms = _flat(_vals(rstore, "movingSum(m.a, 3)"))
    ma = _flat(_vals(rstore, "movingAverage(m.a, 3)"))
    times = sorted(ms)
    for i, t in enumerate(times):
        if ms[t] is None:
            assert ma[t] is None, t
            continue
        cnt = min(i, 3)
        assert ms[t] == pytest.approx(ma[t] * cnt, abs=1e-9), t


def test_derivative_sums_to_range(rstore):
    """The derivative telescopes: sum of non-null derivative values
    == last - first value of the series."""
    d = _flat(_vals(rstore, "derivative(m.a)"))
    s = _flat(_vals(rstore, "m.a"))
    times = sorted(s)
    got = sum(v for v in d.values() if v is not None)
    assert got == pytest.approx(
        s[times[-1]] - s[times[0]], abs=1e-9
    )


def test_scale_to_seconds_equals_per_step_scale(rstore):
    """scaleToSeconds(s, step) == s for a series whose step IS the
    requested seconds-per-step (the factor is seconds/step = 1)."""
    got = _flat(_vals(rstore, "scaleToSeconds(m.a, 60)"))
    want = _flat(_vals(rstore, "m.a"))
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-9), t
