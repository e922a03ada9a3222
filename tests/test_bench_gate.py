"""bench.py meter-drift gate: leg-RATIO comparison (ADVICE r8).

Documented host/VM variance moves every leg ~25% together, so an
absolute 15% threshold trips on every slow-host round, re-measures on
the same depressed host, and records a depressed number anyway. The
gate now compares the meter NORMALIZED by its sibling leg (whole-host
shifts cancel) and only falls back to an absolute check at 40% — past
any recorded host variance.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "ccs_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


# recorded best round: ingest 275k pts/s with an 18 s batch subtotal
RECORDED = [(275_000.0, 18.0)]


def test_no_history_never_drifts():
    assert not bench._meter_drifted(1.0, 1.0, [])


def test_whole_host_slowdown_does_not_trip():
    # 25% slower host: meter drops 20%, sibling subtotal rises 25% —
    # the normalized value is unchanged, so no re-run burns a pass
    assert not bench._meter_drifted(275_000.0 * 0.8, 18.0 * 1.25, RECORDED)


def test_single_leg_regression_trips():
    # meter drops 30% while the sibling legs hold steady: that is an
    # engine regression in this path, not host noise — re-measure
    assert bench._meter_drifted(275_000.0 * 0.7, 18.0, RECORDED)


def test_outright_collapse_trips_even_with_matching_sibling():
    # everything 2x slower (meter halves, subtotal doubles): the
    # ratio is fine but the absolute 40% floor still re-measures —
    # a real collapse must not hide behind proportionality
    assert bench._meter_drifted(275_000.0 * 0.5, 18.0 * 2.0, RECORDED)


def test_faster_rounds_never_trip():
    assert not bench._meter_drifted(275_000.0 * 1.2, 18.0 * 0.9, RECORDED)
