"""bench.py meter-drift gate: leg-RATIO comparison (ADVICE r8).

Documented host/VM variance moves every leg ~25% together, so an
absolute 15% threshold trips on every slow-host round, re-measures on
the same depressed host, and records a depressed number anyway. The
gate compares the meter NORMALIZED by its sibling basis — the
common-leg subtotal for the batch meter (rounds add legs over time,
so raw totals would skew against older records) or the sibling
meter's inverse for streaming — and only falls back to an absolute
check at 40%, past any recorded host variance.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "ccs_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _rec(value, rec_norm, cur_norm):
    return [(value, rec_norm, cur_norm)]


def test_no_history_never_drifts():
    assert not bench._meter_drifted(1.0, [])


def test_whole_host_slowdown_does_not_trip():
    # 25% slower host: meter drops 20%, sibling subtotal rises 25% —
    # the normalized value is unchanged, so no re-run burns a pass
    assert not bench._meter_drifted(
        275_000.0 * 0.8, _rec(275_000.0, 18.0, 18.0 * 1.25)
    )


def test_single_leg_regression_trips():
    # meter drops 30% while the sibling legs hold steady: that is an
    # engine regression in this path, not host noise — re-measure
    assert bench._meter_drifted(
        275_000.0 * 0.7, _rec(275_000.0, 18.0, 18.0)
    )


def test_outright_collapse_trips_even_with_matching_sibling():
    # everything 2x slower (meter halves, subtotal doubles): the
    # ratio is fine but the absolute 40% floor still re-measures —
    # a real collapse must not hide behind proportionality
    assert bench._meter_drifted(
        275_000.0 * 0.5, _rec(275_000.0, 18.0, 18.0 * 2.0)
    )


def test_faster_rounds_never_trip():
    assert not bench._meter_drifted(
        275_000.0 * 1.2, _rec(275_000.0, 18.0, 18.0 * 0.9)
    )


def test_common_subtotal_restricts_to_shared_legs():
    # a new round adds legs: only the shared ones count, in each
    # side's OWN timings — the skew the r9 refinement removes
    cur = {"a": 1.0, "b": 2.0, "new": 9.0}
    rec = {"a": 1.5, "b": 2.5, "old": 4.0}
    assert bench._common_subtotal(cur, rec) == 3.0
    assert bench._common_subtotal(rec, cur) == 4.0
    assert bench._common_subtotal({"x": 1.0}, {"y": 1.0}) == 0.0


def test_zero_norm_rounds_are_skipped():
    # no common legs -> that round cannot vote on the ratio; only
    # the absolute floor remains
    assert not bench._meter_drifted(275_000.0, _rec(275_000.0, 0.0, 0.0))
    assert bench._meter_drifted(100_000.0, _rec(275_000.0, 0.0, 0.0))
