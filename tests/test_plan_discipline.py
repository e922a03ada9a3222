"""Plan discipline as a GATE, not just a report: every registered
query's physical plan (graded window + extra registry, built at
sf0.001) must be free of the scale-killers — cartesian products and
row-at-a-time Python — and shuffle joins are held to the explicit
whitelist of queries whose semantics inherently shuffle both sides.
PLANS.md (tools/plan_audit.py) stays the human-readable diff; this
test makes a regression red instead of a doc change someone must
notice."""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"

# queries whose algorithm inherently joins two large sides (verdict-
# acknowledged): LSH survivor/cluster resolution joins bucket pairs,
# DSIR's weighted draw joins scores to thresholds. Everything else
# must broadcast or avoid the join.
SHUFFLE_JOIN_WHITELIST = {
    "dedup_survivors": 1,
    "dedup_clusters": 1,
    # dsir_resample/dsir_scores left this list in r12: the fused
    # single-groupBy ratio table (importance_log_ratios) removed the
    # full-outer SortMergeJoin of the two bucket distributions
    # r12 span masking: match-bounded hit lists join back to the
    # docs on the SAME doc_id partitioning the groupBy established —
    # one bounded Exchange per side, never an n-gram-keyed shuffle
    "contamination_spans": 1,
}


def _registry():
    import __spark_entry__ as entry

    return {**entry.queries(), **entry.extra_queries()}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in _registry().items():
        out[name] = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, bad


def test_no_row_at_a_time_python(plans):
    # Arrow stages (ArrowEvalPython / MapInPandas / FlatMapGroupsIn
    # Pandas) are the sanctioned Python path; BatchEvalPython is the
    # pickled row-at-a-time UDF runner and must never appear
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, bad


def test_shuffle_joins_only_where_whitelisted(plans):
    bad = {}
    for name, p in plans.items():
        n = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", p))
        if n > SHUFFLE_JOIN_WHITELIST.get(name, 0):
            bad[name] = n
    assert not bad, bad
