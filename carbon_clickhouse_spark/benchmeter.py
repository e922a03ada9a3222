"""Pure arithmetic for the streaming-throughput benchmark.

Extracted from bench.py so the measurement can be unit-tested against
synthetic StreamingQuery progress lists (empty, all-empty-batches,
missing-last-batch) — two rounds of driver benches died to harness
arithmetic (r2: NTZ crash, r4: ZeroDivisionError when ``recentProgress``
had not yet published the wave's only data-carrying batch when the
driver read it).

Contract: ``busy_seconds`` may legitimately return 0.0 — progress
publication races ``processAllAvailable()`` return, and a whole wave
can drain inside one deep batch whose progress event is not visible
yet. Callers therefore measure a wall-clock bracket around the drain
and use ``throughput_pps`` which prefers engine-busy time (idle empty
triggers excluded, the sustained-arrival rate) but degrades to the
wall-clock rate instead of dividing by zero.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Set


def busy_seconds(
    progress: Iterable[Mapping], seen_batches: Set[int]
) -> float:
    """Engine time (seconds) spent in NEW data-carrying triggers.

    ``progress`` is a list of StreamingQuery progress dicts (the shape
    of ``q.recentProgress``); ``seen_batches`` the batchIds already
    counted before the measured wave landed. Entries with missing
    keys are skipped rather than raising: a progress dict published
    mid-update is a measurement artifact, not a bench failure.
    """
    total_ms = 0.0
    for p in progress:
        try:
            if p["batchId"] in seen_batches or p["numInputRows"] <= 0:
                continue
            total_ms += float(p["durationMs"]["triggerExecution"])
        except (KeyError, TypeError, ValueError):
            continue
    return total_ms / 1000.0


def throughput_pps(rows: int, busy_s: float, wall_s: float) -> float:
    """Points/sec for ``rows`` drained in ``busy_s`` engine time over a
    ``wall_s`` wall-clock bracket.

    Prefers the engine-busy rate (idle trigger gaps excluded — the
    rate under continuous arrival); falls back to the wall rate when
    no busy time is visible. Never raises on zero denominators: if
    both are <= 0 the wave measured nothing and the rate is 0.0, which
    ``max()`` accumulation upstream treats as a no-op sample.
    """
    if rows <= 0:
        return 0.0
    if busy_s > 0:
        return rows / busy_s
    if wall_s > 0:
        return rows / wall_s
    return 0.0
