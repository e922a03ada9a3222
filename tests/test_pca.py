"""Distributed PCA / exact moment statistics (datapipe/pca.py):
integer-exact covariance vs a numpy reference, bit-stability under
repartitioning, eigen determinism, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.pca import (
    covariance_table,
    explained_variance,
    outlier_scores,
    pca_components,
    pca_project,
)


def _fixture(spark, n=120, d=6, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d)) @ np.diag([3, 2, 1, 0.5, 0.2, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the reference quantization: half-up away from zero, like F.round
    raw = np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in rows]
    ) * 1000
    q = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype(
        np.int64
    )
    return df, q


def test_covariance_exact_vs_numpy(spark):
    df, q = _fixture(spark)
    n = q.shape[0]
    S, S2 = q.sum(axis=0), q.T @ q
    got = {(r.i, r.j): int(r.cov_num) for r in covariance_table(df).collect()}
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == n * int(S2[i, j]) - int(S[i]) * int(S[j]), (i, j)


def test_covariance_partition_invariant(spark):
    df, _ = _fixture(spark)
    a = {(r.i, r.j): int(r.cov_num) for r in covariance_table(df).collect()}
    b = {
        (r.i, r.j): int(r.cov_num)
        for r in covariance_table(df.repartition(7)).collect()
    }
    assert a == b


def test_pca_components_and_projection(spark):
    df, q = _fixture(spark)
    n = q.shape[0]
    cov = covariance_table(df)
    mean, comps, vals = pca_components(cov, k=3)
    S, S2 = q.sum(axis=0), q.T @ q
    ref = (S2 * n - np.outer(S, S)).astype(np.float64) / (
        float(n) * (n - 1) * 1e6
    )
    rvals = np.linalg.eigh(ref)[0][::-1][:3]
    assert np.allclose(sorted(vals, reverse=True), rvals)
    assert np.allclose(mean, S / (n * 1000.0))
    # sign convention: each component's largest-|.| coordinate positive
    for row in comps:
        assert row[np.argmax(np.abs(np.round(row, 12)))] > 0
    # deterministic across invocations
    mean2, comps2, vals2 = pca_components(cov, k=3)
    assert np.array_equal(comps, comps2) and np.array_equal(vals, vals2)
    # projection matches numpy (float path; tolerance, not bit-equal)
    proj = {
        r.vec_id: np.array(r.proj)
        for r in pca_project(df, mean, comps).collect()
    }
    pdf = df.toPandas()
    for rid, vec in zip(pdf["vec_id"], pdf["embedding"]):
        want = comps @ (np.asarray(vec, dtype=np.float64) - mean)
        assert np.allclose(proj[rid], want, atol=1e-9)


def test_pca_project_plan_no_python_no_shuffle(spark):
    df, _ = _fixture(spark)
    mean, comps, _ = pca_components(covariance_table(df), k=2)
    plan = (
        pca_project(df, mean, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_outlier_scores_exact_and_invariant(spark):
    df, q = _fixture(spark)
    n = q.shape[0]
    S = q.sum(axis=0)
    want = {i: int(v) for i, v in enumerate(((q * n - S) ** 2).sum(axis=1))}
    got = {r.vec_id: int(r.dist2_num) for r in outlier_scores(df).collect()}
    assert got == want
    got2 = {
        r.vec_id: int(r.dist2_num)
        for r in outlier_scores(df.repartition(5)).collect()
    }
    assert got2 == want


def test_outlier_scores_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert outlier_scores(df).collect() == []


def test_explained_variance():
    assert explained_variance([3.0, 1.0]) == [0.75, 0.25]
    assert explained_variance([0.0, 0.0]) == [0.0, 0.0]


def test_covariance_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        covariance_table(df)
    with pytest.raises(ValueError):
        pca_components(
            covariance_table(
                spark.createDataFrame(
                    [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
                )
            ),
            k=1,
        )
