"""Streaming two-sample tests (Student t / Welch t / Mann-Whitney /
Kolmogorov-Smirnov): running statistics over a live stream.

Same design as :mod:`.moments` (the r8 template): the batch
operator's state is already a MERGEABLE SUMMARY, so no custom
``applyInPandasWithState`` operator exists here at all —

* the t-family state is six exact DECIMAL(38,0) moment sums per
  group (:func:`..operators.ch_aggregates.two_sample_moment_aggs`),
  maintained by Spark's native incremental aggregation; the final
  statistics are the SAME fixed IEEE tree
  (:func:`..operators.ch_aggregates.two_sample_t_finals`), so the
  replay-parity test asserts bitwise equality with the batch
  operator, not approximation;
* the U/z/KS family lives on the per-distinct-value rank table
  (:func:`..operators.ch_aggregates.two_sample_value_cells`) —
  running counts whose state is bounded by DISTINCT quantized values
  per group, not rows (the same envelope the batch shuffle has).
  Ranks are a GLOBAL property of the table (a new value shifts every
  higher rank), so the rank pass runs at READ time on the state
  snapshot via the shared
  :func:`..operators.ch_aggregates.two_sample_rank_finals` — Spark
  cannot chain a second stateful aggregation behind the first in one
  streaming query, and recomputing a bounded table beats maintaining
  O(distinct) window state per update.

Scale shape: map-side partial aggregation before the one shuffle,
state per group = six decimals (t) or the value-cell table (U/KS);
update mode emits refreshed rows per batch; no watermark — a running
total over everything seen has no window to be late for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.ch_aggregates import (
    two_sample_base,
    two_sample_moment_aggs,
    two_sample_rank_finals,
    two_sample_t_finals,
    two_sample_value_cells,
)

__all__ = [
    "streaming_two_sample_t",
    "streaming_two_sample_cells",
    "finalize_two_sample_ranks",
]


def streaming_two_sample_t(
    events: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    index_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Update-mode running ``(*group_cols, n_rows, t_student,
    t_welch, dof_welch)`` over a streaming frame — numerically
    IDENTICAL to the batch
    :func:`..operators.ch_aggregates.two_sample_tests` t columns on
    the same replayed data. ``n_rows`` (= n0 + n1) is the monotone
    version stamp for latest-wins consumers."""
    gcols = list(group_cols)
    base = two_sample_base(events, gcols, value_col, index_col, scale)
    got = base.groupBy(*gcols).agg(*two_sample_moment_aggs())
    return got.select(
        *gcols,
        (F.col("__n0") + F.col("__n1")).alias("n_rows"),
        *two_sample_t_finals(),
    )


def streaming_two_sample_cells(
    events: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    index_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Update-mode running per-value rank table ``(*group_cols, __q,
    __c, __c0)`` — the U/z/KS state. Feed the LATEST row per
    ``(*group_cols, __q)`` (``__c`` is the monotone stamp) to
    :func:`finalize_two_sample_ranks` for statistics bit-identical
    to the batch operator's."""
    gcols = list(group_cols)
    base = two_sample_base(events, gcols, value_col, index_col, scale)
    return two_sample_value_cells(base, gcols)


def finalize_two_sample_ranks(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """U / z / KS from a state snapshot of
    :func:`streaming_two_sample_cells` — the literal batch
    finalization (shared code object), re-exported so streaming
    consumers never reimplement the rank pass."""
    return two_sample_rank_finals(cells, list(group_cols))
