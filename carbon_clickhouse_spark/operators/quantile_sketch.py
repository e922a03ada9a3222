"""Mergeable quantile sketch — ClickHouse ``quantileDD`` /
``quantileState``+``quantileMerge`` parity (public semantics:
ClickHouse aggregate-function reference; sketch design follows the
DDSketch idea of Masson et al., VLDB 2019: log-spaced buckets give a
relative-error guarantee, and bucket *counts* are trivially
mergeable).

Spark-first and engine-exact by construction:

- The bucket index is computed from the HALF-UP INTEGER-QUANTIZED
  value with pure integer arithmetic (shifts, integer division) — no
  transcendental ever decides a bucket. ``floor(log2)`` is used only
  as a *hint* and is corrected with exact shift comparisons, so a
  libm/StrictMath ULP difference at a power-of-two boundary cannot
  move a value across buckets. State rows therefore hash-match a
  DuckDB oracle and are bit-identical under any partitioning.
- A sketch is just ``(group, bucket, cnt)`` rows: building it is one
  partial-aggregating groupBy (counts combine map-side — the only
  thing that shuffles is ~(groups x occupied buckets) longs, never
  values); merging stored states across a coarser grouping is a
  plain re-aggregation — the AggregatingMergeTree pattern, same as
  :func:`.ch_aggregates.uniq_merge`.
- Estimation walks the cumulative bucket counts with two window
  passes over the tiny state table and reconstructs the bucket
  midpoint with IEEE-exact arithmetic (shift-built powers of two,
  +,*,/ are correctly rounded identically on every IEEE engine).

Guarantee (asserted in tests): with ``m`` sub-bucket bits the
relative error of any quantile estimate is <= 2^-m (default m=7:
0.78%, ClickHouse ``quantileDD`` default accuracy 0.01), plus the
absolute half-up quantization slack of 0.5/scale.

Bucket scheme, for q = round(value * scale) as a signed long:

- q == 0 -> bucket 0
- a = |q| >= 1: k = floor(log2(a)) (shift-corrected), sub-bucket
  sb = ((a - 2^k) << m) div 2^k in [0, 2^m); ordinal
  o = k*2^m + sb + 1; bucket = sign(q) * o.

Inputs are capped at |q| < 2^(62-m) (enforced, never silent) so no
shift can overflow a long.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

#: default half-up quantization scale (micro-units)
DEFAULT_SCALE = 1_000_000
#: default sub-bucket bits: rel. error 2^-7 ~ 0.78% (CH quantileDD 0.01)
DEFAULT_M = 7


_K0 = "__qs_k0"


def bucketize(
    df: DataFrame,
    value_col: str,
    scale: int = DEFAULT_SCALE,
    m: int = DEFAULT_M,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Append the signed bucket ordinal for ``value_col`` while
    preserving every other column (and the streaming watermark, which
    projections keep) — rows with NULL/NaN values are dropped
    (ClickHouse aggregate-function semantics). The building block
    shared by the batch state builder and the streaming windowed
    sketch.

    Values with ``|round(v*scale)| >= 2^(62-m)`` raise (an
    overflowing shift would otherwise mis-bucket silently).
    """
    if m < 1 or m > 16:
        raise ValueError("m must be in [1, 16]")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    keep = [c for c in df.columns if c != value_col]
    v = F.col(value_col).cast("double")
    cap = 1 << (62 - m)
    # cap-check on the DOUBLE before the long cast so the failure is
    # this function's message, not an ANSI cast overflow
    qvd = F.round(v * F.lit(int(scale)))
    src = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(*keep, qvd.alias("__qvd"))
        .filter(
            F.assert_true(
                F.abs(F.col("__qvd")) < F.lit(float(cap)),
                F.lit(
                    f"quantile_sketch: |round(value*{scale})| must be "
                    f"< 2^{62 - m}"
                ),
            ).isNull()
        )
        .select(*keep, F.col("__qvd").cast("long").alias("__qv"))
    )
    a = F.abs(F.col("__qv"))
    with_k0 = src.withColumn(
        _K0, F.floor(F.log2(a.cast("double"))).cast("int")
    )
    k = (
        F.when(F.expr(f"shiftleft(1L, {_K0} + 1)") <= a, F.col(_K0) + 1)
        .when(F.expr(f"shiftleft(1L, {_K0})") > a, F.col(_K0) - 1)
        .otherwise(F.col(_K0))
    )
    with_k = with_k0.withColumn("__k", k)
    sb = F.expr(
        f"shiftleft(abs(__qv) - shiftleft(1L, __k), {m}) div "
        "shiftleft(1L, __k)"
    )
    bucket = F.when(F.col("__qv") == 0, F.lit(0).cast("long")).otherwise(
        F.signum(F.col("__qv")).cast("long")
        * (F.col("__k").cast("long") * F.lit(1 << m) + sb + F.lit(1))
    )
    return with_k.select(*keep, bucket.alias(bucket_col))


def quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = DEFAULT_SCALE,
    m: int = DEFAULT_M,
) -> DataFrame:
    """Build the mergeable state: one ``(group..., bucket, cnt,
    qs_scale, qs_m)`` row per occupied bucket per group.

    NULL and NaN values are skipped (ClickHouse aggregate-function
    semantics). Values with ``|round(v*scale)| >= 2^(62-m)`` raise
    (an overflowing shift would otherwise mis-bucket silently).
    """
    gcols = list(group_cols)
    return (
        bucketize(
            df.select(*gcols, value_col), value_col, scale, m
        )
        .groupBy(*gcols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("qs_scale", F.lit(int(scale)).cast("long"))
        .withColumn("qs_m", F.lit(int(m)).cast("int"))
    )


def _rep_expr(scale: int, m: int):
    """Bucket-midpoint representative value from the signed ordinal:
    sign * 2^k * (1 + (sb + 0.5)/2^m) / scale. Every operation is an
    IEEE-exact +,*,/ on shift-built powers of two — identical on any
    IEEE-754 engine."""
    o = F.abs(F.col("bucket")) - 1
    sb = o % F.lit(1 << m)
    pow2k = F.expr(
        f"cast(shiftleft(1L, cast((abs(bucket) - 1) div {1 << m} as int)) "
        "as double)"
    )
    rep = pow2k * (
        F.lit(1.0) + (sb.cast("double") + F.lit(0.5)) / F.lit(float(1 << m))
    )
    return (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .otherwise(F.signum(F.col("bucket")).cast("double") * rep)
        / F.lit(float(scale))
    )


def quantile_merge(
    sketches: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    scale: int = DEFAULT_SCALE,
    m: int = DEFAULT_M,
) -> DataFrame:
    """ClickHouse ``quantileMerge``: fold stored states across a
    coarser grouping and estimate nearest-rank quantiles. Returns
    ``(*group_cols, q, est)`` — one row per group per requested
    quantile.

    States built with a different ``scale``/``m`` raise (a mixed
    merge would silently mis-estimate; the stamp columns exist so it
    can't).
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")
    gcols = list(group_cols)
    guarded = sketches.filter(
        F.assert_true(
            (F.col("qs_scale") == F.lit(int(scale)))
            & (F.col("qs_m") == F.lit(int(m))),
            F.lit(
                f"quantile_merge: state stamp != (scale={scale}, m={m})"
            ),
        ).isNull()
    )
    counts = guarded.groupBy(*gcols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    wg = Window.partitionBy(*gcols)
    wcum = wg.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("total", F.sum("cnt").over(wg)).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )
    qlits = F.array(*[F.lit(float(q)) for q in qs])
    picked = (
        cum.withColumn("q", F.explode(qlits))
        .withColumn(
            "rank",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("q") * F.col("total").cast("double")),
            ),
        )
        .filter(
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("cnt") < F.col("rank"))
        )
    )
    return picked.select(
        *gcols, "q", _rep_expr(scale, m).alias("est")
    )


def quantile_dd(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    scale: int = DEFAULT_SCALE,
    m: int = DEFAULT_M,
) -> DataFrame:
    """One-shot ``quantileDD``-style estimate: sketch + merge in a
    single plan (state never stored). Same guarantees as the two-step
    path — it IS the two-step path."""
    return quantile_merge(
        quantile_sketch(df, group_cols, value_col, scale, m),
        group_cols,
        qs,
        scale,
        m,
    )
