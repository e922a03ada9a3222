"""Streaming twins for the remaining round-9 statistics: Spearman
rank correlation and one-way ANOVA via running mergeable cells, plus
the family of operators whose batch form IS already a valid
streaming aggregation.

Cells + finalize (the :mod:`.contingency` pattern):

* ``rank_corr`` — ranks are a GLOBAL property of the value
  distribution (one new value shifts every higher rank), so no
  per-group scalar state can maintain them; the joint (x, y) pair
  count table CAN be maintained incrementally (state bounded by
  distinct pairs), and the shared
  :func:`..operators.ch_aggregates.rank_corr_finals` recovers the
  exact half-rank sums from its marginals — bit-identical to the
  batch operator (pinned by test).
* ``anova`` — per-level exact moment cells
  (:func:`..operators.ch_aggregates.anova_cells`, state = level
  cardinality), finalized through the shared pinned between-group
  fold.

Direct-call family: ``variance_family``, ``simple_linear_regression``,
``mean_z_test``, and ``corr_matrix`` are single
``groupBy(...).agg(exact sums).select(finals)`` pipelines — Spark
accepts them VERBATIM on a streaming frame in update mode (native
incremental aggregation over the same mergeable DECIMAL sums), so
the batch function is the streaming operator with no twin code at
all; ``test_streaming_statistics`` pins the bit-parity. The window-
bearing operators (entropy's n, exponential smoothing's t_max)
cannot run behind a streaming aggregation and use cells+finalize
(entropy) or stay batch-side (t_max anchoring is a read-time
question by definition).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.ch_aggregates import (
    anova_cells,
    anova_finals,
    rank_corr_cells,
    rank_corr_finals,
)

__all__ = [
    "streaming_rank_corr_cells",
    "finalize_rank_corr",
    "streaming_anova_cells",
    "finalize_anova",
]


def streaming_rank_corr_cells(
    events: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Update-mode running joint pair-count table ``(*group_cols,
    __x, __y, __c)``. Feed the LATEST row per pair (``__c`` is the
    monotone stamp) to :func:`finalize_rank_corr`."""
    return rank_corr_cells(events, list(group_cols), x_col, y_col)


def finalize_rank_corr(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Spearman from a state snapshot — the shared batch
    finalization; bit-identical to :func:`..operators.ch_aggregates.
    rank_corr` on the replayed data."""
    return rank_corr_finals(cells, list(group_cols))


def streaming_anova_cells(
    events: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    level_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Update-mode running per-level moment table ``(*group_cols,
    __l, __nl, __sl, __ssl)``. Feed the LATEST row per level
    (``__nl`` is the monotone stamp) to :func:`finalize_anova`."""
    return anova_cells(
        events, list(group_cols), value_col, level_col, scale
    )


def finalize_anova(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """F statistic + dof from a state snapshot — the shared batch
    finalization with the pinned between-group fold."""
    return anova_finals(cells, list(group_cols))
