"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force top-k cosine: exact baseline; the dot product runs as
  built-in array expressions (zip_with + aggregate) inside codegen,
  with a broadcast of the (small) query set — no shuffle of the
  candidate side at all.
- LSH-bucketed ANN (random hyperplane signs): scale path — candidates
  shuffle on a short bucket key; only same-bucket pairs are scored.

Quantized variant: embeddings scaled to ints (x*1000 rounded) give an
order-independent, engine-exact dot product — used by the oracle-
checked queries so float summation order can never flip a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot_int(a, b):
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize(col, scale: int = 1000):
    return F.transform(col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _norm_int(a):
    return F.sqrt(_dot_int(a, a).cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    -> (query_id, neighbor_id, cosine, rank); self-matches excluded;
    ties broken by neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col), quantize_scale).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col), quantize_scale).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_int(F.col("qv"), F.col("cv")).cast("double")
                / (_norm_int(F.col("qv")) * _norm_int(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Blocked brute force: the quantized matrix is broadcast to every
    executor; each partition multiplies its block against the full
    matrix with one exact int64 numpy matmul (vectorized, ~100x the
    per-pair lambda form). Still O(n^2) work — that's inherent to
    exact all-pairs; at cluster scale each task owns an n_block x n
    tile. For candidate pruning first, use :func:`lsh_bucketed_pairs`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    v = embeddings.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col), quantize_scale).alias("v")
    )
    # broadcast the full quantized matrix (ids sorted for determinism)
    pdf = v.toPandas().sort_values("id")
    ids = np.asarray(pdf["id"], dtype=np.int64)
    mat = np.asarray([np.asarray(x, dtype=np.int64) for x in pdf["v"]])
    norms = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
    sc = embeddings.sparkSession.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf_block in batches:
            if not len(pdf_block):
                continue
            blk_ids = pdf_block["id"].to_numpy(dtype=np.int64)
            blk = np.asarray(
                [np.asarray(x, dtype=np.int64) for x in pdf_block["v"]]
            )
            blk_norms = np.sqrt((blk * blk).sum(axis=1).astype(np.float64))
            dots = blk @ all_mat.T  # exact int64
            cos = np.round(
                dots.astype(np.float64) / (blk_norms[:, None] * all_norms[None, :]), 6
            )
            # keep id_a < id_b (each pair emitted once, by its lower id)
            mask = (cos >= threshold) & (blk_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": blk_ids[ai],
                    "id_b": all_ids[bj],
                    "cosine": cos[ai, bj],
                }
            )

    return v.mapInPandas(block, out_schema)


def train_ivf_centroids(mat, n_lists: int, iters: int = 5, seed: int = 42):
    """Spherical k-means over L2-normalized rows — seeded, fully
    deterministic. Shared by :func:`ivf_topk` and the DuckDB oracle
    generator so both sides use the identical trained quantizer (the
    oracle then re-derives list assignment + probing + scoring
    independently in SQL).
    """
    import numpy as np

    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 100_000,
) -> DataFrame:
    """IVF approximate top-k cosine: a coarse k-means quantizer
    partitions vectors into ``n_lists`` inverted lists; each query
    scores only its ``n_probe`` nearest lists.

    The scale path next to :func:`brute_force_topk`: candidate volume
    drops by ~n_lists/n_probe, and the expensive scoring is an
    equi-join on ``list_id`` (shuffle on a small int key). Centroids
    are trained driver-side on a bounded sample with seeded numpy
    (deterministic) — at 100 TB you train once on a sample and reuse.
    Output schema matches brute_force_topk; recall < 1.0 by design.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # --- train the coarse quantizer on a bounded sample (driver) ----
    # orderBy+limit (TakeOrderedAndProject) makes the sample identical
    # regardless of file/partition enumeration order — the trained
    # model must not depend on scan order.
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_limit)
        .toPandas()[vec_col]
    )
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    centroids = train_ivf_centroids(mat, n_lists, kmeans_iters)
    sc = embeddings.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)

    def assign_lists(batches, probe: int):
        for pdf in batches:
            if not len(pdf):
                continue
            cent = b_cent.value
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = mn @ cent.T
            # stable sort: equal sims keep index order, i.e. the probe
            # order is (sim DESC, list ASC) — reproducible in SQL
            top = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            ids = pdf[id_col].to_numpy()
            out_ids, out_lists, out_vecs = [], [], []
            for i in range(len(ids)):
                for l in top[i]:
                    out_ids.append(ids[i])
                    out_lists.append(int(l))
                    out_vecs.append(list(pdf[vec_col].iloc[i]))
            yield pd.DataFrame({"id": out_ids, "list_id": out_lists, "v": out_vecs})

    assign_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    cand = embeddings.select(id_col, vec_col).mapInPandas(
        lambda it: assign_lists(it, 1), assign_schema
    )
    q = queries.select(id_col, vec_col).mapInPandas(
        lambda it: assign_lists(it, n_probe), assign_schema
    )

    qq = q.select(
        F.col("id").alias("query_id"), "list_id", quantize(F.col("v")).alias("qv")
    )
    cc = cand.select(
        F.col("id").alias("neighbor_id"), "list_id", quantize(F.col("v")).alias("cv")
    )
    scored = (
        qq.join(cc, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_int(F.col("qv"), F.col("cv")).cast("double")
                / (_norm_int(F.col("qv")) * _norm_int(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int, scale: int = 1) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash recurrence
    (no numpy RNG so results are reproducible everywhere)."""
    out = []
    state = (plane_idx + 1) * 2654435761 % (2**32)
    for i in range(dim):
        state = (state * 1103515245 + 12345) % (2**31)
        out.append(((state / 2**31) - 0.5) * 2 * scale)
    return out


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-dup pairs: random-hyperplane sign bucket, then exact
    cosine inside buckets only. The bucket key is an int — the join
    shuffles ids+vectors once on a short key; at 1000 executors each
    bucket is tiny.
    """
    v = embeddings.select(
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col)).alias("v"),
    )
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        proj = F.aggregate(
            F.zip_with(F.col("v"), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    bucketed = v.withColumn("bucket", sig)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _dot_int(F.col("a.v"), F.col("b.v")).cast("double")
                / (_norm_int(F.col("a.v")) * _norm_int(F.col("b.v"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
