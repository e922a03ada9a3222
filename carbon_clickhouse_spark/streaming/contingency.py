"""Streaming contingency-coefficient family (cramersV /
cramersVBiasCorrected / contingency): running cell counts over a
live stream, finalized on read.

The batch operator's only per-row pass is the (group, x, y) cell
count (:func:`..operators.ch_aggregates.contingency_cells`) — a
mergeable summary bounded by the CONTINGENCY-TABLE size, not the row
count — so the streaming twin is native incremental aggregation over
exactly that grouping, reusing the batch code object. The chi-square
fold and marginals are a GLOBAL property of the whole table (one new
cell changes every expected count), so finalization runs at read
time on the state snapshot via the shared
:func:`..operators.ch_aggregates.contingency_finals` — identical
code, therefore bit-identical to the batch operator on replayed
data; Spark cannot chain the marginal windows behind a streaming
aggregation in one query anyway (multiple-stateful-operator
restriction on aggregations).

Scale shape: map-side combine before the one shuffle; state = one
count per observed (group, x, y) cell — CH's own hash-table
accumulator envelope; update mode re-emits only cells the batch
touched; no watermark (running totals have no window to be late
for).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.ch_aggregates import (
    contingency_cells,
    contingency_finals,
    theils_u_finals,
)

__all__ = [
    "streaming_contingency_cells",
    "finalize_contingency",
    "finalize_theils_u",
]


def streaming_contingency_cells(
    events: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Update-mode running cell table ``(*group_cols, __x, __y,
    __o)`` over a streaming frame. Feed the LATEST row per cell
    (``__o`` is the monotone stamp) to :func:`finalize_contingency`
    for statistics bit-identical to the batch
    :func:`..operators.ch_aggregates.contingency_stats`."""
    return contingency_cells(events, list(group_cols), x_col, y_col)


def finalize_contingency(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """chi_sq / cramers_v / cramers_v_bc / contingency_coef from a
    state snapshot — the literal batch finalization (shared code
    object), re-exported for streaming consumers."""
    return contingency_finals(cells, list(group_cols))


def finalize_theils_u(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Theil's U from the SAME cell snapshot
    :func:`streaming_contingency_cells` maintains — one running cell
    table serves the whole contingency statistics family (CH's own
    CrossTabData layout), each read picking its finalization."""
    return theils_u_finals(cells, list(group_cols))
