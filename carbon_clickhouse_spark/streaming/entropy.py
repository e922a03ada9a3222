"""Streaming Shannon entropy (CH ``entropy(x)``): running
distinct-value counts over a live stream, finalized on read.

Same pattern as :mod:`.contingency` (its single-variable sibling):
the batch operator's only per-row pass is the distinct-value count
table (:func:`..operators.ch_aggregates.entropy_cells`) — a
mergeable summary bounded by value cardinality — maintained by
native incremental aggregation; the entropy fold is a global
property of the table (a new value changes every p), so it runs at
read time on the state snapshot through the shared
:func:`..operators.ch_aggregates.entropy_finals`, bit-identical to
the batch operator on replayed data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.ch_aggregates import entropy_cells, entropy_finals

__all__ = ["streaming_entropy_cells", "finalize_entropy"]


def streaming_entropy_cells(
    events: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Update-mode running value-count table ``(*group_cols, __v,
    __c)``. Feed the LATEST row per value (``__c`` is the monotone
    stamp) to :func:`finalize_entropy`."""
    return entropy_cells(events, list(group_cols), value_col)


def finalize_entropy(
    cells: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Entropy from a state snapshot — the literal batch finalization
    (shared code object)."""
    return entropy_finals(cells, list(group_cols))
