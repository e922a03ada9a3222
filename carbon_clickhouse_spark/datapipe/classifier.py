"""Model-based quality filtering: a hashed n-gram linear classifier.

The filtering stage CCNet/DCLM-style pipelines run between heuristic
gates and dedup: train a cheap linear classifier to separate a
high-quality reference corpus (positives) from raw web text
(negatives), then keep raw documents scoring above a threshold
(fastText's supervised mode is the usual implementation — Joulin et
al., "Bag of Tricks for Efficient Text Classification", EACL 2017).

This module implements the same model — logistic regression over
hashed bag-of-n-gram features — as pure Spark aggregations:

- features: ``xxhash64(ngram) % num_buckets`` occurrence counts,
  L1-normalized per document (fastText's mean-of-embeddings reduces
  to exactly this in the linear case);
- training: full-batch gradient descent, one distributed pass per
  iteration — score every doc (broadcast join on the weight table),
  compute per-bucket gradients (one groupBy), update driver-side.
  The model is at most ``num_buckets`` floats; the corpus is
  touched only through its (doc_id, bucket, x) feature rows, which
  are computed once and cached by the caller via ``persist``;
- no RNG anywhere: zero-init weights, deterministic feature hashing
  — the same corpora train the same model on any cluster layout.

Training cost is ``iters`` shuffles over int-keyed feature rows —
the classifier is intentionally tiny (that is the point of the
method; the quality signal lives in the n-grams, not the model).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .importance import ngram_buckets


@dataclass
class HashedLinearModel:
    """``weights``: (bucket, weight) rows — at most ``num_buckets``;
    ``bias``: scalar; the hash space rides along so scoring cannot
    mis-bucket (same discipline as ``importance.py``)."""

    weights: DataFrame
    bias: float
    n: int
    num_buckets: int


def _features(
    docs: DataFrame, n: int, num_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, bucket, x): L1-normalized per-doc bucket counts."""
    occ = ngram_buckets(docs, n, num_buckets, text_col, id_col)
    cnt = occ.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("t"))
    return cnt.join(tot, "doc_id").select(
        "doc_id", "bucket", (F.col("c") / F.col("t")).alias("x")
    )


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    n: int = 2,
    num_buckets: int = 1 << 16,
    iters: int = 10,
    lr: float = 0.5,
    l2: float = 1e-6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> HashedLinearModel:
    """Logistic regression: positives (reference corpus) vs negatives
    (raw sample), full-batch Adagrad (Duchi et al. 2011): each
    bucket's step is ``lr * g / sqrt(sum g^2)``, which makes
    convergence independent of the document-length-induced feature
    scale (plain GD either crawls or oscillates here, and diagonal
    Newton explodes on rare buckets whose curvature is ~0). Per-step
    movement is bounded by ``lr`` per bucket, so training is stable
    for any input; the problem is convex. ``positives``/``negatives``
    doc_ids may overlap freely — rows are re-keyed internally."""
    spark = positives.sparkSession
    pos = positives.select(
        F.concat(F.lit("p"), F.col(id_col).cast("string")).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.lit(1.0).alias("y"),
    )
    neg = negatives.select(
        F.concat(F.lit("n"), F.col(id_col).cast("string")).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.lit(0.0).alias("y"),
    )
    data = pos.unionByName(neg)
    feats = _features(data, n, num_buckets, "text", "doc_id").persist()
    labels = data.select("doc_id", "y").persist()
    m = labels.count()  # materializes both caches

    weights = spark.createDataFrame(
        [], "bucket long, weight double, gsq double"
    )
    bias, bias_gsq = 0.0, 0.0
    for _ in range(iters):
        sig = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.col("z") + F.lit(bias)))
        )
        scored = (
            feats.join(
                F.broadcast(weights.select("bucket", "weight")),
                "bucket",
                "left",
            )
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0))
                ).alias("z")
            )
            .join(labels, "doc_id")
            .select("doc_id", (sig - F.col("y")).alias("err"))
        )
        grads = (
            feats.join(scored, "doc_id")
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("err")) / F.lit(m)).alias("g"))
        )
        bias_g = (
            scored.agg((F.sum("err") / F.lit(m)).alias("g")).first()["g"]
            or 0.0
        )
        g = F.coalesce(F.col("g"), F.lit(0.0))
        gsq = F.coalesce(F.col("gsq"), F.lit(0.0)) + g * g
        weights = (
            weights.join(grads, "bucket", "full_outer")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("weight"), F.lit(0.0))
                    * F.lit(1.0 - lr * l2)
                    - F.lit(lr) * g / F.sqrt(gsq + F.lit(1e-12))
                ).alias("weight"),
                gsq.alias("gsq"),
            )
            # materialize each step: the weight lineage would otherwise
            # grow by one join per iteration and recompute everything
            .localCheckpoint(eager=True)
        )
        bias_gsq += bias_g * bias_g
        bias -= lr * bias_g / ((bias_gsq + 1e-12) ** 0.5)
    feats.unpersist()
    labels.unpersist()
    return HashedLinearModel(
        weights=weights.select("bucket", "weight"),
        bias=bias,
        n=n,
        num_buckets=num_buckets,
    )


def score_documents(
    docs: DataFrame,
    model: HashedLinearModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, quality_score)`` in (0, 1) — P(reference-like).
    Every input doc_id appears (featureless docs score
    ``sigmoid(bias)``). One explode + broadcast join + one groupBy."""
    feats = _features(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ),
        model.n,
        model.num_buckets,
        "text",
        "doc_id",
    )
    z = (
        feats.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0))
            ).alias("z")
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(z, "doc_id", "left").select(
        "doc_id",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(F.coalesce(F.col("z"), F.lit(0.0)) + F.lit(model.bias))
                )
            )
        ).alias("quality_score"),
    )


def filter_by_quality(
    docs: DataFrame,
    model: HashedLinearModel,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring ``>= threshold`` (all original
    columns, plus the score)."""
    scores = score_documents(docs, model, text_col, id_col).select(
        F.col("doc_id").alias("__q_id"), "quality_score"
    )
    return (
        docs.join(scores, F.col(id_col) == F.col("__q_id"), "inner")
        .drop("__q_id")
        .filter(F.col("quality_score") >= threshold)
    )
