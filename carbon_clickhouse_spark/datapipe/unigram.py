"""Unigram-LM subword tokenizer (the SentencePiece ``unigram`` model)
trained over the corpus in Spark, applied back as a broadcast
piece-probability table.

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018,
arXiv:1804.10959): model a word as the product of independent piece
probabilities, train piece probabilities with EM over the
segmentation lattice, then repeatedly prune the pieces whose removal
costs the least likelihood until the vocabulary fits. Encoding is the
Viterbi segmentation under the final probabilities.

Scale shape (the part that must survive 100 TB):

- like :mod:`.bpe`, the only pass over the text is
  :func:`.bpe.word_frequencies` — everything else runs over the
  BOUNDED ``{word: count}`` table (<= ``max_words`` rows).
- seeding explodes each word's substrings (length <= ``max_piece_len``)
  into one hash aggregation; the seed keeps the top
  ``seed_size`` by total frequency (ties by piece asc — deterministic)
  plus every single character (segmentability guarantee).
- the E-step is embarrassingly parallel: ``mapInPandas`` over word
  rows with the piece log-probs BROADCAST, emitting per-piece expected
  counts; each word's lattice forward/backward is a pure function of
  (word, broadcast probs), so the only cross-partition reduction is
  the M-step sum — which runs in DECIMAL over per-row quantized
  contributions, making training bit-deterministic under any
  partitioning (a double sum would be partition-order dependent).
- the prune step runs driver-side over the bounded piece table
  (per-piece Viterbi of the piece itself against the others), exactly
  like the BPE merge loop runs driver-side over the word table.
- :func:`unigram_encode` broadcasts the final (piece, logp) rows and
  Viterbi-segments each document in ``mapInPandas`` with a per-batch
  word cache; text never shuffles.

Reference: the reference engine has no tokenizer — this is part of
the LLM-datapipe surface built on the same corpus tables (see
:mod:`.bpe` for the BPE sibling).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .bpe import word_frequencies
from .text import BPE_TOKEN_RE

#: quantization for M-step sums: contributions round to this many
#: decimal places and sum in decimal(38,9) — exact, order-independent
_Q = 9


@dataclass
class UnigramModel:
    """Trained unigram tokenizer: piece -> log probability."""

    log_probs: dict[str, float]
    vocab_size: int
    n_words_table: int
    em_log_likelihoods: list[float] = field(default_factory=list)

    def viterbi(self, word: str) -> list[str]:
        return _viterbi(word, self.log_probs)


def _viterbi(
    word: str,
    logp: dict[str, float],
    exclude: str | None = None,
) -> list[str]:
    """Best segmentation of ``word`` under ``logp`` (first-found wins
    on exact ties; the ascending-j scan makes that the LONGEST last
    piece — deterministic). Falls back to characters for anything
    unseen (chars are always in the vocabulary by construction; an
    unseen character gets a floor score so any word segments).
    ``exclude`` pretends one piece is absent — the prune step's
    "best alternative" probe, without copying the table."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    floor = min(logp.values(), default=-10.0) - 10.0
    for i in range(1, n + 1):
        for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
            piece = word[j:i]
            if piece == exclude:
                continue
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = floor  # unseen character: still segmentable
                else:
                    continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i], back[i] = cand, j
    if best[n] == -math.inf:
        return list(word) if exclude is None else []
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


#: hard cap on piece length scanned by the lattice loops (the seed
#: never produces longer pieces; keeps the inner loop O(L) not O(n))
_MAX_PIECE_LEN_HARD = 16


def seed_pieces(
    words: DataFrame,
    seed_size: int = 50_000,
    max_piece_len: int = 8,
) -> DataFrame:
    """Candidate pieces: every substring (length <= max_piece_len) of
    the word table weighted by word frequency, top ``seed_size`` by
    total frequency (ties by piece asc), UNIONed with every single
    character (which can never be pruned — they guarantee any word
    segments). Returns ``(piece, freq)``."""
    if max_piece_len > _MAX_PIECE_LEN_HARD:
        raise ValueError(f"max_piece_len > {_MAX_PIECE_LEN_HARD}")
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, length(word) - 1), s -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                "length(word) - s)), l -> substring(word, s + 1, l))))"
            )
        ).alias("piece"),
        F.col("freq"),
    )
    counted = subs.groupBy("piece").agg(F.sum("freq").alias("freq"))
    chars = (
        counted.filter(F.length("piece") == 1)
        .select("piece", "freq")
    )
    top = (
        counted.filter(F.length("piece") > 1)
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(int(seed_size))
    )
    return chars.unionByName(top)


def _e_step(
    words: DataFrame, logp: dict[str, float]
) -> tuple[dict[str, float], float]:
    """One EM E-step over the word table: returns (expected piece
    counts, corpus log-likelihood). Deterministic: per-word lattice
    math is a pure function of the broadcast probs; the cross-word
    sums quantize to decimal."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = words.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)

    def run(batches: Iterator["pd.DataFrame"]):
        lp = b_logp.value
        acc: dict[str, float] = {}
        ll = 0.0
        for pdf in batches:
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                alpha = [-math.inf] * (n + 1)
                alpha[0] = 0.0
                for i in range(1, n + 1):
                    tot = -math.inf
                    for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
                        p = lp.get(word[j:i])
                        if p is None or alpha[j] == -math.inf:
                            continue
                        v = alpha[j] + p
                        tot = (
                            v
                            if tot == -math.inf
                            else max(tot, v)
                            + math.log1p(math.exp(-abs(tot - v)))
                        )
                    alpha[i] = tot
                if alpha[n] == -math.inf:
                    continue  # unsegmentable (never, with chars seeded)
                beta = [-math.inf] * (n + 1)
                beta[n] = 0.0
                for j in range(n - 1, -1, -1):
                    tot = -math.inf
                    for i in range(
                        j + 1, min(n, j + _MAX_PIECE_LEN_HARD) + 1
                    ):
                        p = lp.get(word[j:i])
                        if p is None or beta[i] == -math.inf:
                            continue
                        v = beta[i] + p
                        tot = (
                            v
                            if tot == -math.inf
                            else max(tot, v)
                            + math.log1p(math.exp(-abs(tot - v)))
                        )
                    beta[j] = tot
                z = alpha[n]
                ll += freq * z
                for i in range(1, n + 1):
                    for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
                        piece = word[j:i]
                        p = lp.get(piece)
                        if (
                            p is None
                            or alpha[j] == -math.inf
                            or beta[i] == -math.inf
                        ):
                            continue
                        e = math.exp(alpha[j] + p + beta[i] - z) * freq
                        if e > 0.0:
                            acc[piece] = acc.get(piece, 0.0) + e
        rows = list(acc.items())
        if rows:
            yield pd.DataFrame(
                {
                    "piece": [r[0] for r in rows],
                    "c": [r[1] for r in rows],
                    "__ll": [ll] + [0.0] * (len(rows) - 1),
                }
            )[["piece", "c", "__ll"]]
        elif ll:
            yield pd.DataFrame({"piece": [""], "c": [0.0], "__ll": [ll]})

    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("c", T.DoubleType()),
            T.StructField("__ll", T.DoubleType()),
        ]
    )
    agg = (
        words.mapInPandas(run, out_schema)
        .groupBy("piece")
        .agg(
            F.sum(F.col("c").cast(f"decimal(38,{_Q})")).alias("c"),
            F.sum(F.col("__ll").cast(f"decimal(38,{_Q})")).alias("ll"),
        )
        .collect()
    )
    counts = {
        r["piece"]: float(r["c"]) for r in agg if r["piece"] and r["c"]
    }
    ll = float(sum(r["ll"] for r in agg if r["ll"] is not None))
    return counts, ll


def train_unigram(
    docs_or_words: DataFrame,
    vocab_size: int = 8_000,
    text_col: str = "text",
    seed_size: int = 50_000,
    max_piece_len: int = 8,
    max_words: int = 1_000_000,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> UnigramModel:
    """Train the unigram tokenizer. ``docs_or_words`` is either a
    documents frame (``text_col`` present — the word table derives
    via :func:`.bpe.word_frequencies`) or a prebuilt ``(word, freq)``
    table.

    Loop per Kudo 2018 §3.2: EM (``em_iters`` sub-iterations) to fit
    piece probabilities, then prune to ``shrink`` of the current size
    (never below ``vocab_size``, never single characters), pruning
    the pieces with the smallest likelihood loss — approximated, as in
    SentencePiece, by freq * (logp(piece) - best alternative
    segmentation of the piece using the OTHER pieces); a piece whose
    own probability beats its alternative by the most is kept.
    Repeats until the vocabulary fits, then one final EM fixes the
    probabilities. ``em_log_likelihoods`` records the corpus LL after
    every E-step — non-decreasing within each EM run (the EM
    guarantee, asserted in tests)."""
    cols = set(docs_or_words.columns)
    words = (
        docs_or_words
        if {"word", "freq"} <= cols
        else word_frequencies(
            docs_or_words, text_col=text_col, max_words=max_words
        )
    )
    words = words.select("word", F.col("freq").cast("double")).persist()
    n_words = words.count()
    seed = seed_pieces(
        words, seed_size=seed_size, max_piece_len=max_piece_len
    ).collect()
    total = sum(float(r["freq"]) for r in seed) or 1.0
    logp = {
        r["piece"]: math.log(float(r["freq"]) / total) for r in seed
    }
    lls: list[float] = []
    while True:
        for _ in range(max(1, em_iters)):
            counts, ll = _e_step(words, logp)
            lls.append(ll)
            tot = sum(counts.values()) or 1.0
            # keep every current piece: a zero-expectation piece gets
            # a floor so the prune step (not the M-step) retires it
            floor = math.log(0.5 / tot)
            logp = {
                p: (
                    math.log(counts[p] / tot) if counts.get(p) else floor
                )
                for p in logp
            }
        multi = [p for p in logp if len(p) > 1]
        target = max(int(vocab_size), int(len(logp) * shrink))
        if len(logp) <= max(vocab_size, 1):
            break
        # prune: loss of removing piece ~= its own logp vs the best
        # alternative segmentation by the remaining pieces
        losses = []
        for p in multi:
            alt = _viterbi(p, logp, exclude=p)
            alt_lp = (
                sum(logp.get(x, -1e9) for x in alt) if alt else -1e9
            )
            losses.append((logp[p] - alt_lp, p))
        # keep the pieces whose own prob most exceeds their
        # alternative (large margin = load-bearing); drop the rest
        losses.sort(key=lambda t: (-t[0], t[1]))
        n_chars = len(logp) - len(multi)
        keep_multi = max(0, target - n_chars)
        kept = {p for _, p in losses[:keep_multi]}
        new_logp = {
            p: lp
            for p, lp in logp.items()
            if len(p) == 1 or p in kept
        }
        if len(new_logp) == len(logp):
            break  # nothing prunable: chars alone exceed the target
        logp = new_logp
        if len(logp) <= max(vocab_size, 1):
            break
    counts, ll = _e_step(words, logp)
    lls.append(ll)
    tot = sum(counts.values()) or 1.0
    floor = math.log(0.5 / tot)
    final: dict[str, float] = {}
    for p in logp:
        c = counts.get(p)
        if c:
            final[p] = math.log(c / tot)
        elif len(p) == 1:
            # zero-expectation characters stay, floored — still
            # needed for unseen-word segmentability
            final[p] = floor
    logp = final
    words.unpersist()
    return UnigramModel(
        log_probs=logp,
        vocab_size=len(logp),
        n_words_table=n_words,
        em_log_likelihoods=lls,
    )


def unigram_encode(
    docs: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-segment every document's pre-tokens under the trained
    model: ``mapInPandas`` with the (bounded) piece table broadcast
    and a per-batch word cache (Zipf: words repeat). Appends
    ``out_col`` (array<string>); text never shuffles."""
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    spark = docs.sparkSession
    b_logp = spark.sparkContext.broadcast(model.log_probs)
    fields = list(docs.schema.fields) + [
        T.StructField(out_col, T.ArrayType(T.StringType()))
    ]
    schema = T.StructType(fields)
    token_re = _re.compile(BPE_TOKEN_RE)

    def run(batches: Iterator["pd.DataFrame"]):
        lp = b_logp.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                for w in token_re.findall(text or ""):
                    got = cache.get(w)
                    if got is None:
                        got = _viterbi(w, lp)
                        if len(cache) < 200_000:
                            cache[w] = got
                    pieces.extend(got)
                out.append(pieces)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return docs.mapInPandas(run, schema)


def pieces_to_ids(
    df: DataFrame,
    vocab: dict[str, int],
    pieces_col: str = "pieces",
    out_col: str = "token_ids",
) -> DataFrame:
    """Map the pieces array to int ids via a literal map (bounded by
    the vocabulary — thousands of entries, a plan literal, no join or
    Python)."""
    keys = sorted(vocab)
    m = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(int(vocab[k])) for k in keys]),
    )
    return df.withColumn(
        out_col,
        F.transform(F.col(pieces_col), lambda p: F.element_at(m, p)),
    )


def tokenize_corpus_unigram(
    docs: DataFrame,
    out_root: str,
    seq_len: int = 2048,
    vocab_size: int = 8_192,
    shard_col: str = "source",
    max_words: int = 1_000_000,
) -> UnigramModel:
    """Unigram twin of :func:`.bpe.tokenize_corpus`: train the
    unigram model on the prepared corpus, Viterbi-encode, pack into
    exact ``seq_len`` sequences, and write the artifacts —

    - ``<out_root>/sequences``: (shard, seq_id, token_ids) parquet,
      partitioned by shard
    - ``<out_root>/tokenizer/unigram_vocab``: (piece, id, logp) — ids
      assigned by sorted piece (deterministic), fully reconstructing
      the tokenizer

    The eos/document-separator id is ``len(pieces)`` — one past the
    learned vocabulary."""
    import os

    from .pack import pack_token_ids

    spark = docs.sparkSession
    model = train_unigram(
        docs, vocab_size=vocab_size, max_words=max_words
    )
    vocab = {p: i for i, p in enumerate(sorted(model.log_probs))}
    if shard_col not in docs.columns:
        docs = docs.withColumn(shard_col, F.lit("all"))
    enc = pieces_to_ids(unigram_encode(docs, model), vocab)
    packed = pack_token_ids(
        enc, seq_len, eos_id=len(vocab), ids_col="token_ids",
        shard_col=shard_col,
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_root, "sequences")
    )
    spark.createDataFrame(
        [(p, vocab[p], model.log_probs[p]) for p in sorted(vocab)],
        "piece string, id int, logp double",
    ).write.mode("overwrite").parquet(
        os.path.join(out_root, "tokenizer", "unigram_vocab")
    )
    return model


def load_unigram(spark: SparkSession, out_root: str) -> UnigramModel:
    """Reload a tokenizer written by :func:`tokenize_corpus_unigram`."""
    import os

    rows = spark.read.parquet(
        os.path.join(out_root, "tokenizer", "unigram_vocab")
    ).collect()
    return UnigramModel(
        log_probs={r["piece"]: r["logp"] for r in rows},
        vocab_size=len(rows),
        n_words_table=0,
    )
