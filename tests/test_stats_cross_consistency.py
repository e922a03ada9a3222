"""Cross-operator statistics consistency (r12): classical identities
that tie DIFFERENT aggregate implementations to each other over
seeded random data — a bug in any one family's algebra breaks an
identity even when its own oracle fixture happens to pass.

Each identity is a theorem about the definitions (F = t^2 for a
two-level one-way ANOVA; k_xy * k_yx = r^2; Spearman of a monotone
transform = 1; Theil's U of a variable with itself = -1 in CH's
negated convention; Cramer's V of a perfect association = 1), so the
tolerance only covers the final IEEE expression trees — the exact
decimal accumulators underneath must agree or the identity misses by
far more than ulps."""

import math
import random

import pytest

from carbon_clickhouse_spark.operators.ch_aggregates import (
    anova_f,
    contingency_stats,
    rank_corr,
    simple_linear_regression,
    stat_moments,
    theils_u,
    two_sample_tests,
    variance_family,
)


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(0x5EED)
    out = []
    for g in ("g1", "g2"):
        for i in range(200):
            x = round(rng.uniform(-20, 20), 3)
            # y correlated with x but noisy
            y = round(0.7 * x + rng.uniform(-5, 5), 3)
            out.append((g, i % 2, x, y))
    return out


@pytest.fixture(scope="module")
def df(spark, rows):
    return spark.createDataFrame(
        rows, "g string, lvl int, x double, y double"
    ).cache()


def test_anova_two_levels_is_t_squared(df):
    """One-way ANOVA over a 2-level factor: F = t_student^2 with
    df_between = 1, df_within = n - 2 — ties anova_f's
    between/within decomposition to two_sample_tests' pooled-variance
    t on the same quantized grid."""
    f = {r.g: (r.f_stat, r.df_between, r.df_within)
         for r in anova_f(df, ["g"], "x", "lvl").collect()}
    t = {r.g: r.t_student
         for r in two_sample_tests(df, ["g"], "x", "lvl").collect()}
    for g in f:
        f_stat, dfb, dfw = f[g]
        assert dfb == 1 and dfw == 198
        assert f_stat == pytest.approx(t[g] ** 2, rel=1e-9), g


def test_slope_product_is_corr_squared(df):
    """OLS both ways: k_xy * k_yx = r^2 (and r matches stat_moments'
    corr) — ties simpleLinearRegression's normal equations to the
    moment family's correlation on the same grid."""
    import pyspark.sql.functions as F

    kxy = {r.g: r.k for r in simple_linear_regression(
        df, ["g"], "x", "y", x_scale=1000, y_scale=1000).collect()}
    kyx = {r.g: r.k for r in simple_linear_regression(
        df, ["g"], "y", "x", x_scale=1000, y_scale=1000).collect()}
    # stat_moments' y_col contract: the caller pre-quantizes y (the
    # aggregate casts it straight to the integer decimal grid)
    dq = df.select("g", "x", F.round(F.col("y") * 1000).alias("yq"))
    cor = {r.g: r.corr_pop for r in stat_moments(
        dq, ["g"], "x", y_col="yq").collect()}
    for g in kxy:
        assert kxy[g] * kyx[g] == pytest.approx(
            cor[g] ** 2, rel=1e-9
        ), g


def test_spearman_of_monotone_transform_is_one(spark, df):
    """rankCorr(x, m(x)) = 1 for any strictly increasing m (ranks are
    invariant) and rankCorr(x, -x) = -1; the midrank machinery must
    produce identical rank vectors on both sides."""
    import pyspark.sql.functions as F

    d2 = df.select("g", "x", (F.col("x") * 3 + 100).alias("m"),
                   (-F.col("x")).alias("neg"))
    up = {r.g: r.rank_corr
          for r in rank_corr(d2, ["g"], "x", "m").collect()}
    dn = {r.g: r.rank_corr
          for r in rank_corr(d2, ["g"], "x", "neg").collect()}
    for g in up:
        assert up[g] == pytest.approx(1.0, abs=1e-12), g
        assert dn[g] == pytest.approx(-1.0, abs=1e-12), g


def test_theils_u_self_is_minus_one(spark, df):
    """theilsU(x, x) = -1 in CH's negated convention: the conditional
    distribution n_ab/n_b is degenerate (every ln term 0), so dep = 0
    and (0 - h_a)/h_a = -1 — ties the joint-cell scaffolding to the
    marginal entropies."""
    import pyspark.sql.functions as F

    d2 = df.select("g", (F.col("lvl") + (F.col("x") > 0).cast("int") * 2
                         ).alias("c"))
    got = {r.g: r.theils_u
           for r in theils_u(d2, ["g"], "c", "c").collect()}
    for g, u in got.items():
        assert u == pytest.approx(-1.0, abs=1e-12), g


def test_cramers_v_perfect_association_is_one(spark, df):
    """cramersV(x, f(x)) = 1 for any injective relabeling f: the
    table is diagonal, chi^2 = n*(k-1), V = 1 — ties the chi-square
    fold to its own normalization."""
    import pyspark.sql.functions as F

    d2 = df.select(
        "g",
        (F.col("lvl") + (F.col("x") > 0).cast("int") * 2).alias("a"),
    ).select("g", "a", (F.col("a") * 7 + 3).alias("b"))
    got = {r.g: r.cramers_v
           for r in contingency_stats(d2, ["g"], "a", "b").collect()}
    for g, v in got.items():
        assert v == pytest.approx(1.0, rel=1e-12), g


def test_variance_sample_population_ratio(df):
    """var_samp / var_pop = n/(n-1) exactly as a ratio of the same
    decimal sums, and stddev_pop^2 = var_pop up to one sqrt
    round-trip."""
    out = {r.g: r for r in variance_family(df, ["g"], "x").collect()}
    n = 200
    for g, r in out.items():
        assert r.var_samp / r.var_pop == pytest.approx(
            n / (n - 1), rel=1e-12
        ), g
        assert r.stddev_pop ** 2 == pytest.approx(
            r.var_pop, rel=1e-12
        ), g


def test_symmetric_data_has_zero_skew(spark):
    """Exactly symmetric integer data: m3 accumulates to decimal 0,
    so skewness is 0.0 bit-exactly (not approximately) — any
    quantization or partial-sum bug shows as a nonzero residue."""
    rows = []
    rng = random.Random(9)
    for i in range(150):
        v = round(rng.uniform(0.001, 30), 3)
        rows += [("s", v), ("s", -v)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = stat_moments(df, ["g"], "x").collect()[0]
    assert out.skew_pop == 0.0
