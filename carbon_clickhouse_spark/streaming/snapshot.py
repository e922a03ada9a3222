"""Snapshot-recompute streaming for anchor-bearing aggregates —
the EXECUTABLE form of the decayed family's streaming contract
(r11, verdict #4).

The ``exponentialTimeDecayed*`` family anchors every term at the
group's GLOBAL t_max, so no incremental state can fold it: a later
batch that raises t_max retroactively rescales every previously
accumulated term by ``e^((old_max - new_max)/x)``, and applying that
correction to stored DECIMAL(28,12) sums would compound quantization
error batch by batch (the pinned no-twin contract in
:func:`..operators.ch_aggregates.exponential_time_decayed`). The
supported streaming form is SNAPSHOT-RECOMPUTE: accumulate arrivals,
and after each micro-batch run the BATCH operator over everything
seen so far — each snapshot is then bit-identical to a batch run at
that moment *by construction*, which the replay-parity test asserts
as equality, not approximation.

Scale shape: the accumulated table is one parquet tree partitioned
by micro-batch (append = write a new batch directory, so Spark's
foreachBatch retries are idempotent — a re-run OVERWRITES its own
directory instead of duplicating rows). Each snapshot is a full
batch-operator run over the accumulation — an honest O(total-seen)
per batch, which is exactly what the anchor semantics cost; callers
who need cheaper streams use the anchor-free twins
(:mod:`.moments`, :mod:`.statistics`) whose sums fold incrementally.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame


def snapshot_stream(
    events: DataFrame,
    accum_path: str,
    compute: Callable[[DataFrame], DataFrame],
    publish: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    query_name: str = "snapshot_decayed",
):
    """Start a snapshot-recompute stream: per micro-batch, (1) land
    the batch under ``accum_path/batch=<id>`` (mode=overwrite — the
    deterministic directory makes foreachBatch retries idempotent),
    (2) read the whole accumulation, (3) run ``compute`` (the BATCH
    operator — e.g. ``lambda df: exponential_time_decayed_avg(df,
    ["g"], "v", "t", 11.0)``) over it, (4) hand the snapshot and the
    batch id to ``publish``. Returns the StreamingQuery.

    ``publish`` owns delivery (write a serving table, update a view,
    push to a sink); it receives a fully materializable DataFrame
    whose contents are bit-identical to the batch operator over the
    data landed so far — the executable form of the decayed family's
    snapshot contract, pinned by
    ``tests/test_streaming_snapshot.py``."""
    spark = events.sparkSession

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(accum_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(out)
        acc = spark.read.option("recursiveFileLookup", "true").parquet(
            accum_path
        )
        publish(compute(acc), batch_id)

    writer = events.writeStream.foreachBatch(on_batch).queryName(
        query_name
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
