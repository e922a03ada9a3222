"""Distributed PCA and exact second-moment statistics over an
embedding column — the dimensionality-reduction / whitening /
outlier-screening preprocessing an embedding-based curation pipeline
(SemDeDup-style clustering, ANN indexing, quality filtering) runs
before its distance computations.

Everything order-sensitive is exact integer arithmetic over the
shared half-up quantization (:func:`.similarity.quantize`), so
results are bit-identical under any partitioning and engine-portable
(DuckDB HUGEINT reproduces them) — float reductions would depend on
partition boundaries at 100 TB.

Scale shape:
- :func:`covariance_table`: ONE scan; each input partition reduces to
  a single O(d^2) partial (numpy int64 — safe while
  n_rows_per_partition * (scale*|x|_max)^2 < 2^63, i.e. ~10^5 rows of
  |x|<=10, scale=1000 vectors per partition at d=64), partials explode
  to (i, j, value) triples and one tiny groupBy sums them in
  DECIMAL(38,0) — exact far past int64 at global scale. Nothing about
  the corpus size reaches the driver.
- :func:`pca_components`: collects the BOUNDED d x d covariance table
  (d^2 rows — a response-edge reduction, not corpus data), runs
  numpy ``eigh`` with a deterministic sign convention.
- :func:`pca_project` / :func:`outlier_scores`: broadcast the tiny
  model back; per-row work is pure column expressions (zip_with /
  aggregate over d elements), no shuffle at all.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame, functions as F

from .similarity import quantize

#: DECIMAL(38,0) holds |x| < 10^38: with scale=1000, |x|<=10, d=64
#: the global second moments stay exact through ~10^26 rows.
_DEC = "decimal(38,0)"


def covariance_table(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """Exact integer covariance numerators of the quantized vectors:
    one row per coordinate pair ``i <= j`` with

    - ``s2``: sum over rows of ``q_i * q_j``
    - ``si`` / ``sj``: coordinate sums
    - ``n``: row count
    - ``cov_num = n * s2 - si * sj`` — the covariance numerator;
      ``cov_ij = cov_num / (n * (n-1) * scale^2)``.

    All five are exact integers (DECIMAL(38,0)); the division to
    floats happens only in :func:`pca_components`, identically on any
    engine. ``dim`` defaults to the first row's vector length.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if dim is None:
        first = embeddings.select(
            F.size(vec_col).alias("d")
        ).limit(1).collect()
        if not first:
            raise ValueError("covariance_table: empty embeddings input")
        dim = int(first[0].d)
    d = dim

    part_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("s2", T.ArrayType(T.LongType())),  # upper tri, row-major
        ]
    )
    iu = np.triu_indices(d)

    def partials(batches):
        n = 0
        s = np.zeros(d, dtype=np.int64)
        s2 = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            n += mat.shape[0]
            s += mat.sum(axis=0)
            s2 += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "s2": [s2[iu].tolist()]}
            )

    q = embeddings.select(quantize(F.col(vec_col), scale).alias("q"))
    parts = q.mapInPandas(partials, part_schema)

    # tiny from here on: one row per input partition -> explode the
    # upper triangle and sum exactly in decimal. Triangle offset ->
    # (i, j) via two literal lookup arrays (one element_at each).
    i_lookup = [i for i in range(d) for _ in range(i, d)]
    j_lookup = [j for i in range(d) for j in range(i, d)]
    tri = (
        parts.select(
            F.col("n"),
            F.col("s"),
            F.posexplode("s2").alias("t", "v"),
        )
        .select(
            "n",
            "v",
            F.element_at(F.lit(i_lookup), F.col("t") + 1).alias("i"),
            F.element_at(F.lit(j_lookup), F.col("t") + 1).alias("j"),
            F.col("s"),
        )
        # project si/sj BEFORE the groupBy shuffle: carrying the full
        # d-element s array on every triangle row would shuffle
        # ~d^3/2 longs per partial instead of d^2
        .select(
            "n",
            "v",
            "i",
            "j",
            F.element_at("s", F.col("i") + 1).alias("si"),
            F.element_at("s", F.col("j") + 1).alias("sj"),
        )
    )
    agg = tri.groupBy("i", "j").agg(
        F.sum(F.col("n")).cast("long").alias("n"),
        F.sum(F.col("v").cast(_DEC)).alias("s2"),
        F.sum(F.col("si").cast(_DEC)).alias("si"),
        F.sum(F.col("sj").cast(_DEC)).alias("sj"),
    )
    return agg.select(
        "i",
        "j",
        "n",
        "s2",
        "si",
        "sj",
        (
            F.col("n").cast(_DEC) * F.col("s2")
            - F.col("si") * F.col("sj")
        )
        .cast(_DEC)
        .alias("cov_num"),
    )


def pca_components(
    cov: DataFrame,
    k: int = 8,
    scale: int = 1000,
):
    """Eigendecompose the bounded covariance table (``d^2`` rows —
    the response edge, not corpus data): returns
    ``(mean: np.ndarray[d], components: np.ndarray[k, d],
    eigenvalues: np.ndarray[k])`` with components sorted by
    descending eigenvalue and sign-fixed (the largest-|.| coordinate
    of each component is made positive; ties break to the lowest
    index) so results are deterministic across runs and BLAS builds.
    """
    import numpy as np

    rows = cov.collect()
    if not rows:
        raise ValueError("pca_components: empty covariance table")
    d = max(r.j for r in rows) + 1
    n = int(rows[0].n)
    if n < 2:
        raise ValueError("pca_components: need n >= 2 vectors")
    c = np.zeros((d, d))
    mean = np.zeros(d)
    denom = float(n) * (n - 1) * scale * scale
    for r in rows:
        v = float(int(r.cov_num)) / denom
        c[r.i, r.j] = v
        c[r.j, r.i] = v
        if r.i == r.j:
            mean[r.i] = float(int(r.si)) / (n * scale)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        pivot = np.argmax(np.abs(np.round(row, 12)))
        if row[pivot] < 0:
            row *= -1
    return mean, comps, vals[order]


def pca_project(
    embeddings: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project each vector onto the principal components:
    ``proj = components @ (x - mean)``. The model rides as column
    literals (a k x d broadcast); per-row work is ``zip_with`` +
    ``aggregate`` over d elements — zero shuffle, zero Python."""
    mean_lit = F.lit([float(v) for v in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        mean_lit,
        lambda x, m: x - m,
    )
    comps = [
        F.aggregate(
            F.zip_with(
                centered, F.lit([float(v) for v in row]), lambda x, w: x * w
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for row in components
    ]
    return embeddings.select(
        F.col(id_col), F.array(*comps).alias(out_col)
    )


def outlier_scores(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Exact distance-to-centroid screening: per vector the INTEGER
    ``dist2_num = sum_j (n * q_j - s_j)^2`` where ``s`` is the exact
    coordinate-sum vector — i.e. ``n^2 * scale^2 *
    ||x - mean||^2`` with no floating point anywhere, so ranking and
    thresholds are bit-stable under any partitioning.

    Two passes over the data (the sums, then the scores) but zero
    shuffles of vector data: the d-element ``s`` rides back as a
    broadcast join of a single row; the per-row reduction is
    ``zip_with`` + ``aggregate``. The squared differences accumulate
    in DECIMAL(38,0) (``n * q`` itself must fit int64: fine through
    ~10^15 rows at scale=1000, |x|<=10). ``dist2_num`` returns as a
    decimal — callers wanting a float divide by ``(n * scale)^2``.
    """
    q = embeddings.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("q")
    )
    first = q.select(F.size("q").alias("d")).limit(1).collect()
    if not first:
        return q.select(
            F.col(id_col),
            F.lit(None).cast(_DEC).alias("dist2_num"),
            F.lit(0).cast("long").alias("n"),
        )
    d = int(first[0].d)
    sums = q.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.sum(F.element_at("q", i + 1)).cast("long").alias(f"s{i}")
            for i in range(d)
        ],
    ).select(
        "n", F.array(*[F.col(f"s{i}") for i in range(d)]).alias("s")
    )
    joined = q.crossJoin(F.broadcast(sums))
    diff2 = F.zip_with(
        F.transform("q", lambda x: x * F.col("n")),
        F.col("s"),
        lambda nq, sj: (nq - sj).cast(_DEC) * (nq - sj).cast(_DEC),
    )
    dist2 = F.aggregate(
        diff2,
        F.lit(Decimal(0)).cast(_DEC),
        lambda acc, x: (acc + x).cast(_DEC),
    )
    return joined.select(
        F.col(id_col), dist2.alias("dist2_num"), F.col("n")
    )


def explained_variance(eigenvalues) -> list[float]:
    """Fraction of total variance per returned component (over the
    returned set; pass all d eigenvalues for absolute ratios)."""
    total = float(sum(eigenvalues))
    if total <= 0 or not math.isfinite(total):
        return [0.0 for _ in eigenvalues]
    return [float(v) / total for v in eigenvalues]
