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

from ..operators.ch_aggregates import stat_moment_aggs, stat_moment_finals


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
