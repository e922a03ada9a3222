"""Range/invariant fuzz for the round-8/9 statistics operators: one
seeded DataFrame of ~300 RANDOM groups (mixed sizes, ties, constant
columns, degenerate shapes) drives each operator in a single Spark
job, and every emitted statistic must land in its mathematical range
or be nan — never an ANSI error, never a silently-impossible value.
This is the cheap complement to the hash-exact oracles: the oracle
pins agreement on one fixture shape, this pins sanity on hundreds."""

import math
import random

import pytest

N_GROUPS = 300


def _groups(seed):
    rng = random.Random(seed)
    rows = []
    for g in range(N_GROUPS):
        size = rng.choice((1, 2, 3, 5, 20, 60))
        constant = rng.random() < 0.15
        base = rng.uniform(-50, 50)
        for i in range(size):
            v = base if constant else round(rng.uniform(-50, 50), 2)
            rows.append(
                (
                    "g%03d" % g,
                    v,
                    rng.randrange(2),
                    rng.randrange(4),
                    rng.randrange(3),
                    float(1000 + i * rng.randrange(1, 5)),
                )
            )
    return rows


SCHEMA = "g string, v double, s int, x int, y int, t double"


@pytest.fixture(scope="module")
def fuzz_df(spark):
    return spark.createDataFrame(_groups(99), SCHEMA).cache()


def _ok(val, lo, hi, eps=1e-9):
    return val is None or math.isnan(val) or (lo - eps <= val <= hi + eps)


def test_rank_corr_range(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import rank_corr

    for r in rank_corr(fuzz_df, ["g"], "v", "t").collect():
        assert _ok(r["rank_corr"], -1.0, 1.0), r


def test_theils_u_range(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import theils_u

    # CH's (dep - h_a)/h_a is MINUS the textbook U(x|y): in [-1, 0]
    for r in theils_u(fuzz_df, ["g"], "x", "y").collect():
        assert _ok(r["theils_u"], -1.0, 0.0), r


def test_two_sample_ranges(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        two_sample_tests,
    )

    for r in two_sample_tests(fuzz_df, ["g"], "v", "s").collect():
        assert _ok(r["ks_d"], 0.0, 1.0), r
        if r["u_stat"] is not None and not math.isnan(r["u_stat"]):
            assert r["u_stat"] >= -1e-9, r


def test_contingency_ranges(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        contingency_stats,
    )

    for r in contingency_stats(fuzz_df, ["g"], "x", "y").collect():
        assert _ok(r["cramers_v"], 0.0, 1.0, eps=1e-6), r
        assert _ok(r["cramers_v_bc"], 0.0, 1.0, eps=1e-6), r
        assert _ok(r["contingency_coef"], 0.0, 1.0), r
        if not math.isnan(r["chi_sq"]):
            assert r["chi_sq"] >= -1e-6, r


def test_anova_and_entropy_ranges(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        anova_f,
        entropy_agg,
    )

    for r in anova_f(fuzz_df, ["g"], "v", "x").collect():
        if not math.isnan(r["f_stat"]):
            assert r["f_stat"] >= -1e-9, r
    for r in entropy_agg(fuzz_df, ["g"], "y").collect():
        assert _ok(r["entropy"], 0.0, math.log2(3)), r


def test_variance_family_ranges(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        variance_family,
    )

    for r in variance_family(fuzz_df, ["g"], "v").collect():
        assert r["var_pop"] >= -1e-6, r
        if not math.isnan(r["var_samp"]):
            assert r["var_samp"] >= -1e-6, r
        if not math.isnan(r["stddev_samp"]):
            assert abs(r["stddev_samp"] ** 2 - r["var_samp"]) <= 1e-6 * max(
                1.0, abs(r["var_samp"])
            ), r


def test_exponential_family_sane(fuzz_df):
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        exponential_smoothing,
        exponential_time_decayed,
    )

    got = exponential_smoothing(
        fuzz_df, ["g"], "v", "t", 30.0, 20.0
    ).collect()
    # decayed avg is a convex combination of values: within range
    for r in got:
        assert _ok(r["decayed_avg"], -50.0, 50.0, eps=1e-6), r
    for r in exponential_time_decayed(
        fuzz_df, ["g"], "v", "t", 20.0
    ).collect():
        assert r["decayed_count"] >= 0.0, r


def test_all_operators_survive_every_group_shape(fuzz_df):
    """No ANSI division error anywhere: collecting each operator over
    every random group (incl. size-1, constant, single-class) must
    not raise — the nan-guard contract the oracles rely on."""
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        bounding_ratio,
        corr_matrix,
        mean_z_test,
        simple_linear_regression,
        stat_moments,
    )

    stat_moments(fuzz_df, ["g"], "v", y_col="x").collect()
    bounding_ratio(fuzz_df, ["g"], "t", "v").collect()
    mean_z_test(fuzz_df, ["g"], "v", "s", 2.0, 3.0).collect()
    simple_linear_regression(fuzz_df, ["g"], "t", "v").collect()
    corr_matrix(fuzz_df, ["g"], ["v", "x", "y"]).collect()
