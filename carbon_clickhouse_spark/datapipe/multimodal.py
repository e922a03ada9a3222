"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each partition streams through Python in
vectorized batches (the only sane shape for CPU-bound media work on a
cluster: one task per partition, no driver involvement, linear scale).

The actual codec calls are STUBBED (this container ships no
image/audio libraries): ``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives features from the payload bytes.
The Spark-side plumbing — schemas, batch iteration, partitioning —
is real and tested; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text table into a media table (deterministic fake
    payload = utf-8 bytes of the text) — test fixture for the binary
    plumbing."""
    return df.select(
        F.col("doc_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_batch(payload: bytes, fake: bool = False) -> tuple[int, int, float]:
    """Decode one image payload -> (width, height, mean_byte).

    Real decode requires an imaging library not present in this
    environment; the deterministic fake derives pseudo-dimensions from
    the byte content so the distributed plumbing is fully exercisable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips; run with fake=True or "
            "swap in a real decoder here"
        )
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 577)
    mean_byte = (n * 2654435761 % 25600) / 100.0
    return width, height, mean_byte


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas image feature extraction over binary payloads.

    Arrow streams each partition through Python in batches; output is
    a narrow features table. Partitioning of the input is preserved —
    repartition upstream by size if payloads are skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_batch(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_byte": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at fixed strides
    (stand-in for video keyframe extraction) -> exploded
    (doc_id, frame_idx, frame_bytes). Pure column expressions."""
    n = F.length("payload")
    idxs = F.sequence(
        F.lit(0),
        F.least(F.floor(n / every_n_bytes).cast("int"), F.lit(max_frames - 1)),
    )
    return media.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idxs,
                lambda i: F.substring(
                    F.col("payload"), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
