"""Streaming ``skewPop`` / ``kurtPop`` / ``covarPop`` / ``corr``:
running per-group moment statistics over a live stream.

The point of :func:`..operators.ch_aggregates.stat_moments`'s exact
DECIMAL power sums is that they are MERGEABLE SUMMARIES — so the
streaming twin needs no ``applyInPandasWithState`` at all: Spark's
native incremental aggregation maintains the five (or eight) exact
sums per group in the state store, every micro-batch folds its
partial sums in, and the final moment algebra is the SAME fixed IEEE
expression tree (:func:`..operators.ch_aggregates.stat_moment_finals`,
shared verbatim). Replaying the stream therefore reproduces the batch
operator bit-for-bit — the replay-parity test asserts equality, not
approximation.

Scale shape: state is eight decimals per group (not per event), the
native agg does map-side partial aggregation before the one shuffle,
and late data needs no special handling — a running total over
everything seen has no window to be late FOR. Update output mode
emits each group's refreshed statistics per batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.ch_aggregates import (
    corr_matrix_aggs,
    corr_matrix_filter,
    corr_matrix_finals,
    stat_moment_aggs,
    stat_moment_finals,
)


def streaming_stat_moments(
    events: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    y_col: str | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Update-mode running ``(*group_cols, n_rows, skew_pop,
    kurt_pop[, covar_pop, corr_pop])`` over a streaming frame —
    numerically IDENTICAL to the batch :func:`stat_moments` on the
    same replayed data (exact integer sums are order- and
    batching-independent; the final algebra is the shared expression
    tree). ``n_rows`` is the running row count, the natural
    monotone version stamp for downstream latest-wins consumers."""
    gcols = list(group_cols)
    base = events.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    )
    if y_col is not None:
        base = base.filter(F.col(y_col).isNotNull())
    # the aggregate expressions are SHARED with the batch operator —
    # the bit-for-bit replay-parity contract lives or dies on the two
    # twins quantizing and summing identically
    got = base.groupBy(*gcols).agg(
        *stat_moment_aggs(value_col, y_col, scale)
    )
    return got.select(
        *gcols,
        F.col("__n").alias("n_rows"),
        *stat_moment_finals(y_col is not None),
    )


def streaming_corr_matrix(
    events: DataFrame,
    group_cols: Sequence[str],
    value_cols: Sequence[str],
    scale: int = 1000,
) -> DataFrame:
    """Update-mode running ``corrMatrix`` / ``covarPopMatrix`` in
    long form — one row per unordered column pair per group, plus
    ``n_rows`` as the monotone version stamp. The matrix aggregate
    is pure power sums (count + per-column sums + n(n+1)/2 cross
    sums, all exact DECIMAL(38,0)), so the native incremental
    aggregation maintains them in the state store and the finishing
    tree is SHARED verbatim with the batch
    :func:`..operators.ch_aggregates.corr_matrix` — replaying a
    stream reproduces the batch matrix BIT-for-bit
    (tests/test_streaming_moments.py asserts ``==``).

    Scale shape: state is 1 + 2c + c(c-1)/2 decimals per group
    (c = len(value_cols)), never per-event; map-side partial
    aggregation before the single shuffle; the post-agg explode into
    pair rows is stateless. NOTE the contrast with the
    exponentialTimeDecayed family, which has NO incremental twin by
    design: its weights are anchored to the GLOBAL t_max, so every
    new maximum would retroactively rescale all accumulated terms —
    the documented contract there is snapshot-recompute (run the
    batch operator over the data seen so far), see
    ``operators/ch_aggregates.exponential_time_decayed``."""
    gcols = list(group_cols)
    vcols = list(value_cols)
    agg = (
        events.filter(corr_matrix_filter(vcols))
        .groupBy(*gcols)
        .agg(*corr_matrix_aggs(vcols, scale))
    )
    return corr_matrix_finals(agg, gcols, vcols, keep_n=True)
