"""CCNet-style n-gram language-model perplexity scoring, trained and
applied entirely in Spark.

The CCNet pipeline (Wenzek et al., 2020 — public paper) buckets web
documents into head/middle/tail by the perplexity of a language model
trained on a trusted reference corpus; downstream LLM-data pipelines
keep the low-perplexity bands. The published pipeline scores with a
KenLM 5-gram; this module is the same *selection mechanism* with an
interpolated bigram model whose training is one Spark aggregation —
the right trade at 100 TB, where the scoring join dominates and the
model itself must stay broadcastable.

Scale design:
- **Training** is two groupBy counts (unigram, bigram) over exploded
  tokens with map-side partial aggregation; the model is capped to
  ``vocab_size`` unigrams + ``max_bigrams`` bigrams via distributed
  top-k (TakeOrderedAndProject), never a full sort.
- **Scoring** joins exploded (prev, word) pairs against the model.
  Both model tables are bounded by construction -> broadcast hash
  joins, zero shuffle of the corpus.
- Probabilities are closed-form add-k/interpolation arithmetic in
  IEEE doubles (no iterative EM): deterministic, DuckDB-replicable.

Everything is pure column expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..materialize import materialize

#: sentence-start pseudo-token (prev of the first word of a doc)
BOS = "<s>"
#: out-of-vocabulary pseudo-token
UNK = "<unk>"


def _words(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties filtered (the module's
    shared convention — matches datapipe.importance)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
    )


@dataclass
class BigramLM:
    """A trained model: two bounded DataFrames + scalar stats.

    ``unigrams``: (word, u_count, u_logp) — vocab_size rows.
    ``bigrams``:  (prev, word, b_count)  — max_bigrams rows.
    ``total``: corpus token count; ``vocab``: |vocabulary| + 1 (UNK).
    """

    unigrams: DataFrame
    bigrams: DataFrame
    total: int
    vocab: int
    add_k: float
    lam: float


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    max_bigrams: int = 1_000_000,
    add_k: float = 0.1,
    lam: float = 0.75,
) -> BigramLM:
    """Count-train the interpolated bigram model on a reference
    corpus. Two aggregations; both outputs bounded (top-k by count,
    path-deterministic tie-break on the token) so the scoring side
    can broadcast them.
    """
    # r12 optimization (guide §1.2): four consumers walk this
    # tokenization — the unigram top-k, the bigram top-k, the
    # total-token count and the vocab count — and Spark would re-run
    # the scan + tokenize per consumer. Materialize it once (lazy
    # local checkpoint); the two eager stats jobs below then read the
    # materialized tokens instead of re-tokenizing the corpus.
    toks = materialize(reference.select(_words(text_col).alias("w")))
    uni = (
        toks.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("u_count"))
    )
    # distributed top-k: never a global sort of the vocabulary
    uni = uni.orderBy(F.desc("u_count"), F.asc("word")).limit(vocab_size)

    n = F.size("w")
    grams = toks.select(
        F.explode(
            F.arrays_zip(
                F.concat(F.array(F.lit(BOS)), F.slice("w", 1, n - 1)).alias(
                    "prev"
                ),
                F.col("w").alias("word"),
            )
        ).alias("g")
    ).select(F.col("g.prev").alias("prev"), F.col("g.word").alias("word"))
    bi = (
        grams.groupBy("prev", "word")
        .agg(F.count(F.lit(1)).alias("b_count"))
        .orderBy(F.desc("b_count"), F.asc("prev"), F.asc("word"))
        .limit(max_bigrams)
    )

    stats = toks.select(
        F.sum(F.size("w")).alias("total")
    ).collect()[0]
    total = int(stats["total"] or 0)
    vocab = uni.count() + 1  # + UNK

    # unigram log-prob with add-k smoothing over the capped vocab:
    # p(w) = (c + k) / (total + k * V); OOV scores as c = 0
    u_logp = F.log(
        (F.col("u_count") + F.lit(add_k))
        / F.lit(total + add_k * vocab)
    )
    return BigramLM(
        unigrams=uni.withColumn("u_logp", u_logp),
        bigrams=bi,
        total=total,
        vocab=vocab,
        add_k=add_k,
        lam=lam,
    )


def bigram_logprobs(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, prev, word, logp) — one row per scored token:

    ``p(w | prev) = lam * c(prev, w) / c(prev)  +  (1 - lam) * p_uni(w)``

    with ``p_uni = (c(w) + k) / (total + k * V)`` computed straight
    from counts (never ``exp(u_logp)`` — the round-trip would cost a
    double-rounding ulp) and OOV handled by the same formula at count
    0, so every term is non-zero and log never sees 0.

    Plan shape: explode -> three BROADCAST joins (the model tables
    are bounded by training). The corpus rows are never shuffled by
    token.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), _words(text_col).alias("w"))
    n = F.size("w")
    pairs = toks.filter(n > 0).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.concat(F.array(F.lit(BOS)), F.slice("w", 1, n - 1)).alias(
                    "prev"
                ),
                F.col("w").alias("word"),
            )
        ).alias("g"),
    ).select(
        "doc_id", F.col("g.prev").alias("prev"), F.col("g.word").alias("word")
    )

    uni = F.broadcast(lm.unigrams.select("word", "u_count"))
    bi = F.broadcast(lm.bigrams)
    # context counts: c(prev) from the unigram table (BOS context =
    # one start per training doc is not tracked; BOS backs off to the
    # unigram path by scoring c(prev)=NULL)
    ctx = F.broadcast(
        lm.unigrams.select(
            F.col("word").alias("prev"), F.col("u_count").alias("c_prev")
        )
    )

    scored = (
        pairs.join(uni, "word", "left")
        .join(bi, ["prev", "word"], "left")
        .join(ctx, "prev", "left")
    )
    p_uni = (
        F.coalesce(F.col("u_count"), F.lit(0)) + F.lit(lm.add_k)
    ) / F.lit(lm.total + lm.add_k * lm.vocab)
    p_bi = F.when(
        F.col("b_count").isNotNull() & F.col("c_prev").isNotNull(),
        F.col("b_count") / F.col("c_prev"),
    ).otherwise(F.lit(0.0))
    logp = F.log(F.lit(lm.lam) * p_bi + F.lit(1.0 - lm.lam) * p_uni)
    return scored.select("doc_id", "prev", "word", logp.alias("logp"))


def score_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ``perplexity = exp(-mean log p)`` over the
    document's tokens (see :func:`bigram_logprobs` for the model
    arithmetic and the broadcast plan shape)."""
    return (
        bigram_logprobs(docs, lm, text_col, id_col)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.exp(-F.avg("logp")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    bounds: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    ppl_col: str = "perplexity",
) -> DataFrame:
    """CCNet's head/middle/tail banding: corpus-quantile cutoffs on
    perplexity (head = lowest band = best). One pass for the two
    exact cutoffs (percentile over doubles), then a pure column
    CASE — the cutoff row is 2 scalars, computed distributed and
    applied without a join."""
    lo, hi = (
        scored.select(
            F.expr(f"percentile({ppl_col}, {bounds[0]})").alias("lo"),
            F.expr(f"percentile({ppl_col}, {bounds[1]})").alias("hi"),
        ).collect()[0]
    )
    band = (
        F.when(F.col(ppl_col) <= lo, "head")
        .when(F.col(ppl_col) <= hi, "middle")
        .otherwise("tail")
    )
    return scored.withColumn("band", band)
