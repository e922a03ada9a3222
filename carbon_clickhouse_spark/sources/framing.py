"""Length-framed blob landing format shared by the binary live fronts.

The plain-text fronts land newline-delimited chunk files; the binary
protocols (pickle frames, Prometheus write bodies, Telegraf JSON
bodies, gRPC payloads) need a delimiter-free equivalent. We reuse the
pickle protocol's own 4-byte big-endian length framing
(``receiver/pickle.go:39`` / ``sources/pickle_source.py``) as the
universal chunk format: a receiver appends ``frame_blob(body)`` per
received message, the chunk file streams into Spark via the
``binaryFile`` source, and :func:`framed_bodies` explodes each file
back into one row per message. Self-delimiting, append-only, and the
pickle wire stream is ALREADY in this format so it lands verbatim.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

from .pickle_source import split_frames

_BODY_SCHEMA = T.StructType([T.StructField("body", T.BinaryType())])


def frame_blob(body: bytes) -> bytes:
    """4-byte big-endian length prefix + body (pickle wire framing)."""
    return struct.pack(">I", len(body)) + body


def framed_bodies(files: DataFrame, blob_col: str = "content") -> DataFrame:
    """binaryFile rows (whole landed chunk files) -> one ``body`` row
    per framed message. Arrow-batched; a truncated trailing frame is
    dropped exactly like the reference dropping a half-read
    connection."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[bytes] = []
            for blob in pdf[blob_col]:
                rows.extend(split_frames(bytes(blob)))
            yield pd.DataFrame({"body": rows})

    return files.select(blob_col).mapInPandas(run, _BODY_SCHEMA)
