"""Pickle protocol source (S3) — ``receiver/pickle.go`` /
``receiver/pickle_parser.go``.

Wire format: 4-byte big-endian length frames (64 MiB cap,
``pickle.go:17``), each a Python pickle of
``[(name, (timestamp, value)), ...]``. The reference parses with a
hand-rolled pickle walker (``pickle_parser.go:24-84``); here frames
land as binary blobs (files/Kafka) and decode with the stdlib in
``mapInPandas`` — Python is the native speaker of this format.

Semantics mirrored: name/ts/value coerced like the reference
(values may be int/float/str; unparsable entries skipped), double-dot
normalize + tag canonicalize applied after decode.
"""

from __future__ import annotations

import io
import math
import pickle
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from ..functions.dates import ts_to_date
from ..functions.tags import graphite_canonicalize

MAX_FRAME = 67108864  # 64 MiB (receiver/pickle.go:17)

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("time", T.LongType()),
    ]
)


def split_frames(stream: bytes) -> list[bytes]:
    """4-byte BE length-framed stream -> payload list (oversized or
    truncated frames stop parsing, as the reference drops the
    connection)."""
    frames = []
    i, n = 0, len(stream)
    while i + 4 <= n:
        (ln,) = struct.unpack(">I", stream[i : i + 4])
        if ln > MAX_FRAME or i + 4 + ln > n:
            break
        frames.append(stream[i + 4 : i + 4 + ln])
        i += 4 + ln
    return frames


class _PrimitiveUnpickler(pickle.Unpickler):
    """Unpickler restricted to primitive containers.

    The pickle receiver is attacker-facing by design; unrestricted
    ``pickle.loads`` on wire frames is arbitrary code execution. The
    reference avoids this with a hand-rolled opcode walker
    (``receiver/pickle_parser.go:24-84``) that only understands
    lists/tuples/str/bytes/numbers — the entire grammar the graphite
    pickle protocol uses. We get the same guarantee by refusing the two
    escape hatches an attacker needs: class lookup (GLOBAL /
    STACK_GLOBAL, required by REDUCE/OBJ/NEWOBJ to reach a callable)
    and persistent ids. Everything else the stdlib decodes is inert
    data.
    """

    def find_class(self, module: str, name: str):  # noqa: ARG002
        raise pickle.UnpicklingError("global lookup forbidden in wire frames")

    def persistent_load(self, pid):  # noqa: ARG002
        raise pickle.UnpicklingError("persistent ids forbidden in wire frames")


def safe_loads(frame: bytes):
    """Decode a wire frame allowing only primitive objects (no
    globals, no reduce, no persistent ids) — parity with the
    reference's opcode walker, same attack surface: none."""
    return _PrimitiveUnpickler(io.BytesIO(frame)).load()


def decode_frame(frame: bytes) -> list[tuple[str, float, int]]:
    """One pickle frame -> [(canonical_name, value, ts)]."""
    try:
        items = safe_loads(frame)
    except Exception:
        return []
    out = []
    for item in items if isinstance(items, (list, tuple)) else []:
        try:
            name, (ts, value) = item
            if isinstance(name, bytes):
                name = name.decode("utf-8")
            value = float(value)
            ts = int(float(ts))
            if not -(1 << 63) <= ts < (1 << 63):
                continue  # int64 overflow would abort the Arrow batch
        except (TypeError, ValueError, UnicodeDecodeError):
            continue
        if math.isnan(value):
            continue
        name = _normalize(name)
        canonical = graphite_canonicalize(name)
        if canonical:
            out.append((canonical, value, ts))
    return out


def _normalize(name: str) -> str:
    while ".." in name:
        name = name.replace("..", ".")
    return name


def pickle_frames_to_points(
    blobs: DataFrame,
    blob_col: str = "content",
    framed: bool = True,
    version: Column | int = 0,
) -> DataFrame:
    """Binary blobs (each a framed stream, or one bare frame when
    ``framed=False``) -> canonical points."""
    version_col = F.lit(version).cast("long") if isinstance(version, int) else version

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, float, int]] = []
            for blob in pdf[blob_col]:
                data = bytes(blob)
                frames = split_frames(data) if framed else [data]
                for frame in frames:
                    rows.extend(decode_frame(frame))
            yield pd.DataFrame(rows, columns=["path", "value", "time"])

    raw = blobs.mapInPandas(run, _RAW_SCHEMA)
    return raw.select(
        "path",
        "value",
        "time",
        ts_to_date("time").alias("date"),
        version_col.alias("version"),
    )
