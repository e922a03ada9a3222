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


def _drop_zero_vectors(df, vcol: str):
    """Cosine against a zero-magnitude vector is undefined — and
    under ANSI mode the norm division is a QUERY-KILLING error, so a
    single dead embedding (failed embedder, empty doc) would take a
    100 TB job down with it. Vectors whose QUANTIZED norm is zero
    (exact zero, or below the engine's 1/scale resolution — no
    direction either way) are skipped like every other NULL-ish
    input in this module; found by the r9 degenerate-embeddings
    probe."""
    return df.filter(_dot_int(F.col(vcol), F.col(vcol)) > 0)


def _with_norm(df, vcol: str, ncol: str):
    """Zero-vector filter + the vector's norm as a COLUMN, computed
    once per vector (r13, guide §1.2 step 2 / §2.3 "project before
    the exchange"): the cosine expression used to call
    ``_norm_int(v)`` — a full zip_with+aggregate over the array —
    inside the PER-PAIR projection, so each side's norm was
    recomputed once per joined pair (candidate norms x |queries|,
    query norms x |candidates|). The self-dot also subsumes the
    zero-vector filter's dot. ``sqrt(cast(dot))`` is the identical
    expression tree ``_norm_int`` builds, so cosines are
    bit-identical; the column is materialized below the join (joins
    reference attributes, not expressions), so it cannot be
    re-inlined per pair."""
    d = _dot_int(F.col(vcol), F.col(vcol))
    return (
        df.withColumn("__sq", d)
        .filter(F.col("__sq") > 0)
        .withColumn(ncol, F.sqrt(F.col("__sq").cast("double")))
        .drop("__sq")
    )


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
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"),
            quantize(F.col(vec_col), quantize_scale).alias("qv"),
        ),
        "qv",
        "qn",
    )
    c = _with_norm(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            quantize(F.col(vec_col), quantize_scale).alias("cv"),
        ),
        "cv",
        "cn",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_int(F.col("qv"), F.col("cv")).cast("double")
                / (F.col("qn") * F.col("cn")),
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
    num_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Distributed block x block grid: vectors are hashed into
    ``num_blocks`` blocks; every block-pair (i <= j) becomes one
    ``applyInPandas`` group that multiplies its two tiles with an
    exact int64 numpy matmul. Nothing is ever collected to the
    driver — each vector is shuffled ``(num_blocks+1)/2`` times (its
    row of the pair grid), each task owns an (n/B) x (n/B) tile, and
    the pair set is independent of the blocking. Still O(n^2) compute
    — inherent to exact all-pairs; size num_blocks ~ sqrt(n_rows /
    rows_per_tile) so tiles fit executor memory, and use
    :func:`lsh_bucketed_pairs` when candidate pruning is acceptable.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    v = embeddings.select(
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col), quantize_scale).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("blk"),
    )
    # block-pair grid (i <= j): tiny — broadcast against the vectors
    spark = embeddings.sparkSession
    grid = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(num_blocks) if i <= j],
        "bi long, bj long",
    )
    left = grid.join(v, F.col("bi") == F.col("blk")).select(
        "bi", "bj", "id", "v", F.lit(0).alias("side")
    )
    right = (
        grid.filter(F.col("bi") != F.col("bj"))
        .join(v, F.col("bj") == F.col("blk"))
        .select("bi", "bj", "id", "v", F.lit(1).alias("side"))
    )
    tiles = left.unionByName(right)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def tile(key, pdf):
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1] if key[0] != key[1] else a
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        a_ids = a["id"].to_numpy(dtype=np.int64)
        b_ids = b["id"].to_numpy(dtype=np.int64)
        am = np.asarray([np.asarray(x, dtype=np.int64) for x in a["v"]])
        bm = np.asarray([np.asarray(x, dtype=np.int64) for x in b["v"]])
        an = np.sqrt((am * am).sum(axis=1).astype(np.float64))
        bn = np.sqrt((bm * bm).sum(axis=1).astype(np.float64))
        dots = am @ bm.T  # exact int64
        cos = np.round(dots.astype(np.float64) / (an[:, None] * bn[None, :]), 6)
        # emit each pair once, keyed by its lower id (covers the
        # within-block diagonal tile and cross-block tiles alike)
        mask = (cos >= threshold) & (a_ids[:, None] < b_ids[None, :])
        ai, bj = np.nonzero(mask)
        lo, hi = a_ids[ai], b_ids[bj]
        if key[0] != key[1]:
            # cross tile sees both orientations; normalize to lo < hi
            mask2 = (cos >= threshold) & (a_ids[:, None] > b_ids[None, :])
            ai2, bj2 = np.nonzero(mask2)
            lo = np.concatenate([lo, b_ids[bj2]])
            hi = np.concatenate([hi, a_ids[ai2]])
            cosv = np.concatenate([cos[ai, bj], cos[ai2, bj2]])
        else:
            cosv = cos[ai, bj]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cosv})

    return tiles.groupBy("bi", "bj").applyInPandas(tile, out_schema)


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


def _train_quantizer(
    embeddings: DataFrame,
    n_lists: int,
    iters: int,
    id_col: str,
    vec_col: str,
    sample_limit: int,
):
    """Coarse spherical-k-means quantizer trained driver-side on a
    bounded sample. orderBy+limit (TakeOrderedAndProject) makes the
    sample identical regardless of file/partition enumeration order —
    the trained model must not depend on scan order."""
    import numpy as np

    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_limit)
        .toPandas()[vec_col]
    )
    if len(sample) == 0:
        # an empty corpus trains nothing: a clear error beats the
        # obscure numpy axis error it used to raise (r11 empty-input
        # probe); ivf_topk's empty-corpus fast path avoids it
        raise ValueError("cannot train IVF centroids: empty embeddings")
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    return train_ivf_centroids(mat, n_lists, iters)


def _assign_lists(
    df: DataFrame, centroids, probe: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, list_id, v) rows for each vector's ``probe`` nearest
    centroid lists — the Arrow-batched assignment stage shared by
    :func:`ivf_topk` and :func:`semantic_dedup`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    b_cent = df.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cent = b_cent.value
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mn = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
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
            yield pd.DataFrame(
                {"id": out_ids, "list_id": out_lists, "v": out_vecs}
            )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(assign, schema)


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

    Unlike :func:`pq_topk` / :func:`ivfpq_topk`, the QUERY side never
    materializes on the driver — ``_assign_lists`` streams it through
    mapInPandas against broadcast centroids — so there is no
    ``max_queries`` cap to apply (a dead parameter of that name was
    removed in r12; ADVICE r11).
    """
    # empty corpus: nothing to train on and nothing to retrieve —
    # an empty result with the contract schema (r11 empty-input probe)
    if not embeddings.take(1):
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [],
            "query_id long, neighbor_id long, cosine double, rank long",
        )
    # --- train the coarse quantizer on a bounded sample (driver) ----
    centroids = _train_quantizer(
        embeddings, n_lists, kmeans_iters, id_col, vec_col, sample_limit
    )
    cand = _assign_lists(embeddings, centroids, 1, id_col, vec_col)
    q = _assign_lists(queries, centroids, n_probe, id_col, vec_col)

    qq = _with_norm(
        q.select(
            F.col("id").alias("query_id"), "list_id",
            quantize(F.col("v")).alias("qv"),
        ),
        "qv",
        "qn",
    )
    cc = _with_norm(
        cand.select(
            F.col("id").alias("neighbor_id"), "list_id",
            quantize(F.col("v")).alias("cv"),
        ),
        "cv",
        "cn",
    )
    scored = (
        qq.join(cc, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_int(F.col("qv"), F.col("cv")).cast("double")
                / (F.col("qn") * F.col("cn")),
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


def embedding_stats(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
) -> DataFrame:
    """Per-group embedding distribution stats:
    (group, n_vecs, avg_sq_norm, min_norm, max_norm).

    Norms run over quantized int64 dot products, so every aggregate is
    an exact integer (order-independent — float sums would depend on
    partitioning); the only doubles are the final identical division /
    sqrt chains. One partial-aggregating groupBy on the group key.
    """
    s2 = quantize_scale * quantize_scale
    d = _dot_int(quantize(F.col(vec_col), quantize_scale), quantize(F.col(vec_col), quantize_scale))
    per_vec = embeddings.select(F.col(group_col).alias("grp"), d.alias("d"))
    return per_vec.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_vecs"),
        (
            F.sum("d").cast("double")
            / (F.count("*") * F.lit(s2)).cast("double")
        ).alias("avg_sq_norm"),
        (F.sqrt(F.min("d").cast("double")) / quantize_scale).alias("min_norm"),
        (F.sqrt(F.max("d").cast("double")) / quantize_scale).alias("max_norm"),
    )


def knn_label_vote(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label vote — the label-noise / auto-label primitive: each
    query's predicted label is the majority label of its k nearest
    neighbors (ties -> smallest label), compared against its own.

    -> (query_id, own_label, pred_label, n_votes, is_match). Built on
    :func:`brute_force_topk` (swap in :func:`ivf_topk` candidates at
    scale); the vote is a groupBy on (query_id, label) + a k-row
    window — negligible next to the scoring join.
    """
    nn = brute_force_topk(embeddings, queries, k, id_col, vec_col)
    nbr_labels = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        nn.join(nbr_labels, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nbr_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_label").alias("pred_label"), "n_votes")
    )
    own = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("own_label")
    )
    return pred.join(own, "query_id").select(
        "query_id",
        F.col("own_label").cast("long").alias("own_label"),
        F.col("pred_label").cast("long").alias("pred_label"),
        "n_votes",
        (F.col("own_label") == F.col("pred_label")).cast("long").alias("is_match"),
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


def derive_num_planes(
    n_rows: int, target_bucket_size: int = 128, lo: int = 8, hi: int = 24
) -> int:
    """Planes ~ log2(n / target_bucket): 2^planes buckets keep the
    expected bucket population (and thus the O(bucket^2) in-bucket
    join) constant as data grows — the property that makes the LSH
    path survive a 100x scale-up."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(n_rows, 2) / target_bucket_size))))


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int | None = None,
    num_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_size: int = 128,
    n_rows: int | None = None,
) -> DataFrame:
    """ANN near-dup pairs: ``num_tables`` independent random-hyperplane
    sign buckets; candidate pairs collide in ANY table, then exact
    cosine verifies inside buckets (no false positives — banding only
    costs recall).

    Scale shape: the join key is (table, bucket int); vectors shuffle
    ``num_tables`` times, each bucket holds ~``target_bucket_size``
    rows by construction (``num_planes`` defaults to
    log2(n/target_bucket_size), counted with one cheap job unless
    ``n_rows`` is passed). Recall/cost trade: for pair collision
    probability q = (1 - angle/pi)^planes per table, overall recall is
    1 - (1-q)^tables — more planes cut join cost exponentially, more
    tables buy the recall back linearly in shuffle volume.

    Signatures are computed in one Arrow-batched numpy matmul per
    batch (the per-plane higher-order-lambda form runs interpreted,
    ~num_planes*num_tables folds per row).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    v = _drop_zero_vectors(
        embeddings.select(
            F.col(id_col).alias("id"),
            quantize(F.col(vec_col)).alias("v"),
        ),
        "v",
    )
    if num_planes is None:
        n = n_rows if n_rows is not None else v.count()
        num_planes = derive_num_planes(n, target_bucket_size)

    planes = np.asarray(
        [
            _hyperplane(dim, t * num_planes + p)
            for t in range(num_tables)
            for p in range(num_planes)
        ],
        dtype=np.float64,
    ).T  # dim x (tables * planes)
    weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))

    sig_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.LongType())),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def sigs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray([np.asarray(x, dtype=np.int64) for x in pdf["v"]])
            bits = (m.astype(np.float64) @ planes > 0).astype(np.int64)
            frames = []
            for t in range(num_tables):
                chunk = bits[:, t * num_planes : (t + 1) * num_planes]
                frames.append(
                    pd.DataFrame(
                        {
                            "id": pdf["id"].to_numpy(dtype=np.int64),
                            "v": pdf["v"],
                            "tbl": t,
                            "bucket": chunk @ weights,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from ..materialize import materialize

    # r13 (guide §1.2): the self-join's sides are planned
    # independently, so joining the raw lineage ran the Python
    # signature stage TWICE (the same duplication the minhash bucket
    # table had before r12); materialize it once. The vector norm is
    # likewise attached as a column BEFORE the join — the cosine
    # projection recomputed both sides' zip_with+aggregate norms per
    # candidate PAIR. sqrt(cast(dot)) is _norm_int's exact tree, and
    # the (n_a, n_b) multiplication order matches the old
    # (_norm_int(a.v) * _norm_int(b.v)) — cosines bit-identical.
    bucketed = materialize(
        v.mapInPandas(sigs, sig_schema).withColumn(
            "n", _norm_int(F.col("v"))
        )
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _dot_int(F.col("a.v"), F.col("b.v")).cast("double")
                / (F.col("a.n") * F.col("b.n")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the coarse spherical
    k-means quantizer, then within each cluster keep ONE
    representative of every near-duplicate group (cosine >=
    ``threshold``) — the published recipe for pruning semantically
    redundant web data before training.

    -> (id, cluster_id, keep, dup_of): ``keep=false`` rows name the
    surviving representative in ``dup_of``. Determinism: ids are
    processed ascending per cluster; a vector is dropped iff an
    already-kept LOWER id is within threshold (greedy keep-first, the
    same survivor rule as the exact-dedup family).

    Scale: the O(c^2) comparison is per-cluster (SemDeDup's own cost
    bound — clusters are sized by n_clusters, tune it so c fits an
    Arrow batch); the cluster assignment is one Arrow pass over the
    data against broadcast centroids, and the groupBy shuffles each
    vector exactly once on its int cluster key. Nothing materializes
    on the driver beyond the sampled centroids, so there is no
    ``max_queries`` cap (a dead parameter of that name was removed
    in r12; ADVICE r11).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    centroids = _train_quantizer(
        embeddings, n_clusters, kmeans_iters, id_col, vec_col, sample_limit
    )
    assigned = _assign_lists(embeddings, centroids, 1, id_col, vec_col)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("keep", T.BooleanType()),
            T.StructField("dup_of", T.LongType()),
        ]
    )

    def prune(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = pdf["id"].to_numpy()
        kept_idx: list[int] = []
        keep_flags, dup_of = [], []
        for i in range(len(ids)):
            if kept_idx:
                sims = m[kept_idx] @ m[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    keep_flags.append(False)
                    dup_of.append(int(ids[kept_idx[j]]))
                    continue
            kept_idx.append(i)
            keep_flags.append(True)
            dup_of.append(None)
        return pd.DataFrame(
            {
                "id": ids,
                "cluster_id": key[0],
                "keep": keep_flags,
                "dup_of": pd.array(dup_of, dtype="Int64"),
            }
        )

    return assigned.groupBy("list_id").applyInPandas(prune, schema)


# --------------------------------------------------------------------
# Product quantization (PQ): the storage-side companion to the IVF
# routing above. Jegou et al. 2011 ("Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI 33(1)) — the layout Faiss calls IVF-PQ
# and every billion-vector deployment uses: vectors are stored as m
# uint8 codes (d*4 bytes -> m bytes, 32x at d=64/m=8), and queries
# score candidates with an ADC lookup table instead of touching the
# original floats.
# --------------------------------------------------------------------


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 100_000,
):
    """Train per-subspace k-means codebooks on a bounded,
    scan-order-independent sample (same discipline as
    :func:`_train_quantizer`). Vectors are L2-normalized first so the
    ADC inner product ranks like cosine. -> numpy (m, n_codes, d//m),
    driver-side and small (m * n_codes * d/m floats = d * n_codes —
    256 KiB at d=256): at 100 TB this broadcasts, never shuffles.
    """
    import numpy as np

    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_limit)
        .toPandas()[vec_col]
    )
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, min(n_codes, len(mat)), dsub))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=books.shape[1], replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes array<int>): each vector's nearest codeword per
    subspace (squared-L2, the PQ encode rule). One Arrow pass against
    the broadcast codebooks; the output row is m small ints — this is
    the frame you persist as the 100 TB index (parquet dictionary
    encoding shrinks it further)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    b_books = df.sparkSession.sparkContext.broadcast(np.asarray(codebooks))

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            books = b_books.value
            m, _, dsub = books.shape
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                # ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2; argmin drops ||x||^2
                d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (
                    sub @ books[j].T
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(encode, schema)


def _collect_queries(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    max_queries: int = 65_536,
):
    """Driver-side materialization of the ANN QUERY side — bounded by
    contract (queries << corpus; the corpus never leaves the
    executors). The limit+1 probe fails fast with a clear error
    instead of OOMing the driver when a caller passes a corpus-sized
    frame by mistake (r10 verdict minor note); chunk the query set or
    raise ``max_queries`` for genuinely larger batches."""
    rows = (
        queries.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(max_queries) + 1)
        .toPandas()
    )
    if len(rows) > max_queries:
        raise ValueError(
            f"ANN query side exceeds max_queries={max_queries}; "
            "chunk the query set or raise the cap"
        )
    return rows


def pq_topk(

    embeddings: DataFrame,
    queries: DataFrame,
    codebooks=None,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
    max_queries: int = 65_536,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation:
    queries stay exact floats; candidates are scored from their codes
    through a per-query lookup table, entirely JVM-side.

    -> (query_id, neighbor_id, score, rank) — ``score`` is the ADC
    inner product against L2-normalized training space (ranks like
    cosine; not the exact cosine value).

    Scale shape: the corpus side never ships floats — it is the m-byte
    ``encoded`` frame (pass it in to amortize across queries). The
    query side collapses to a (m x n_codes) float table per query,
    broadcast to every executor, and scoring is
    zip_with(codes, luts, element_at) + aggregate inside codegen: no
    Python, no shuffle of the corpus, one narrow scan. This is the
    brute-force-over-codes path; compose with the IVF ``list_id``
    routing for the full IVF-PQ when candidates must shrink too.
    """
    import numpy as np

    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, m=m, id_col=id_col, vec_col=vec_col
        )
    books = np.asarray(codebooks)
    m = books.shape[0]
    dsub = books.shape[2]
    if encoded is None:
        encoded = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)

    # per-query ADC lookup tables, built driver-side from the (small)
    # query set: luts[j][c] = <q_j, codebook[j][c]>
    qrows = _collect_queries(queries, id_col, vec_col, max_queries)
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qrows[vec_col]])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    lut_rows = []
    for qi in range(len(qmat)):
        luts = [
            [
                float(round(qmat[qi, j * dsub : (j + 1) * dsub] @ books[j][c], 9))
                for c in range(books.shape[1])
            ]
            for j in range(m)
        ]
        lut_rows.append((int(qrows[id_col].iloc[qi]), luts))
    spark = embeddings.sparkSession
    luts_df = spark.createDataFrame(
        lut_rows, "query_id long, luts array<array<double>>"
    )

    scored = (
        encoded.withColumnRenamed("id", "neighbor_id")
        .crossJoin(F.broadcast(luts_df))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "codes",
                        "luts",
                        lambda c, lut: F.element_at(lut, c + F.lit(1)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 100_000,
    max_queries: int = 65_536,
) -> DataFrame:
    """Full IVF-PQ (the Faiss billion-scale layout): the coarse
    quantizer routes each query to its ``n_probe`` nearest inverted
    lists, and candidates inside those lists are scored from their
    m-byte PQ codes via the query's ADC table — floats never touch
    the scan side at query time.

    -> (query_id, neighbor_id, score, rank), same contract as
    :func:`pq_topk`.

    Scale shape: candidate volume drops ~n_lists/n_probe (IVF) AND
    each candidate row is list_id + m small ints (PQ) — the join is
    an equi-join on the int list key with the tiny query/LUT side
    broadcast, and ADC scoring stays in codegen. This is the plan a
    1000-executor top-k over 10^10 vectors wants: one narrow scan of
    the code table, no shuffle of the corpus, no Python in the hot
    path.
    """
    import numpy as np

    centroids = _train_quantizer(
        embeddings, n_lists, kmeans_iters, id_col, vec_col, sample_limit
    )
    books = train_pq_codebooks(
        embeddings,
        m=m,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        sample_limit=sample_limit,
    )
    m = books.shape[0]
    dsub = books.shape[2]

    # corpus: one list per vector, codes instead of floats
    assigned = _assign_lists(embeddings, centroids, 1, id_col, vec_col)
    coded = pq_encode(assigned, books, id_col="id", vec_col="v").join(
        assigned.select("id", "list_id"), "id"
    )

    # queries: n_probe lists each + a driver-built ADC table
    qrows = _collect_queries(queries, id_col, vec_col, max_queries)
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in qrows[vec_col]]
    )
    qmat = qmat / np.maximum(
        np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12
    )
    probes = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")[
        :, :n_probe
    ]
    lut_rows = []
    for qi in range(len(qmat)):
        luts = [
            [
                float(
                    round(qmat[qi, j * dsub : (j + 1) * dsub] @ books[j][c], 9)
                )
                for c in range(books.shape[1])
            ]
            for j in range(m)
        ]
        qid = int(qrows[id_col].iloc[qi])
        for l in probes[qi]:
            lut_rows.append((qid, int(l), luts))
    spark = embeddings.sparkSession
    luts_df = spark.createDataFrame(
        lut_rows, "query_id long, list_id int, luts array<array<double>>"
    )

    scored = (
        coded.join(F.broadcast(luts_df), "list_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        "codes",
                        "luts",
                        lambda c, lut: F.element_at(lut, c + F.lit(1)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )
