"""Learned byte-pair-encoding tokenizer: trained over the corpus in
Spark, applied back to the corpus as a broadcast merge table.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016, arXiv:1508.07909): start from a
character vocabulary, repeatedly merge the most frequent adjacent
symbol pair. The GPT-2 lineage trains the identical algorithm over a
WORD-FREQUENCY table rather than the raw text — the sequential merge
loop only ever needs ``{word: count}``, not the corpus.

Scale shape (the part that must survive 100 TB):

- ``word_frequencies`` is the only pass over the text: regex
  pre-tokenize + explode + one hash aggregation on the word key
  (map-side partial combine), then a deterministic top-``max_words``
  head (count desc, word asc — TakeOrdered, no global sort). The
  retained table is BOUNDED by contract: BPE statistics saturate long
  before 1M distinct words (the dropped tail is the frequency floor,
  reported in the result), which is the same bounded-driver-sample
  pattern as ``similarity.ivf_topk``'s quantizer.
- the merge loop itself is inherently sequential (merge k+1 depends
  on merge k) and runs driver-side over that bounded table with
  incremental pair-count maintenance — O(words * merges) worst case,
  millisecond-scale per merge at the cap.
- ``bpe_encode`` is the distributed half: the learned merge ranks
  broadcast (<= vocab_size rows), encoding is ``mapInPandas`` with a
  per-batch word cache (Zipf: most words in a batch repeat), text
  never shuffles, output is one tokens array per document.

Determinism: ties in the merge loop break by (count desc, pair asc);
the top-``max_words`` head ties break by word asc — the same corpus
yields the same tokenizer on any partitioning, any cluster, any rerun.

Reference: the reference engine has no tokenizer — this is part of
the LLM-datapipe surface built on the same corpus tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .text import BPE_TOKEN_RE

#: marks the end of a word inside the symbol stream (Sennrich's </w>);
#: merges never cross it, and decoding strips it back to a boundary.
WORD_END = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_freq: int = 1,
) -> DataFrame:
    """``(word, freq)`` for the ``max_words`` most frequent
    pre-tokens, deterministically ordered (freq desc, word asc).

    One shuffle (the word groupBy, with partial aggregation); the
    head is TakeOrdered — no global sort materializes."""
    words = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    ).alias("word")
    return (
        df.select(words)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )


@dataclass
class BpeModel:
    """A trained BPE tokenizer: ordered merges + the id vocabulary."""

    merges: list[tuple[str, str]]
    vocab: dict[str, int] = field(repr=False)
    #: smallest retained word frequency — the boundedness contract:
    #: words rarer than this did not inform the merges.
    min_retained_freq: int = 1

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _pair_counts(
    word_syms: dict[str, list[str]], freqs: dict[str, int]
) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for w, syms in word_syms.items():
        f = freqs[w]
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def train_bpe(
    df: DataFrame,
    vocab_size: int = 1024,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_freq: int = 1,
) -> BpeModel:
    """Learn ``vocab_size`` total symbols (alphabet + merges) from the
    corpus. The corpus is touched exactly once (``word_frequencies``);
    the sequential merge loop runs on the bounded word table."""
    rows = word_frequencies(
        df, text_col=text_col, max_words=max_words, min_freq=min_freq
    ).collect()
    freqs = {r["word"]: int(r["freq"]) for r in rows}
    min_retained = min(freqs.values(), default=0)

    # symbol streams: characters + the word-end marker
    word_syms = {w: list(w) + [WORD_END] for w in freqs}
    alphabet = sorted({s for syms in word_syms.values() for s in syms})
    vocab = {s: i for i, s in enumerate(alphabet)}

    # incremental pair maintenance: recount only words that contained
    # the merged pair (standard Sennrich trick — full recount is
    # O(corpus) per merge, this is O(affected words))
    counts = _pair_counts(word_syms, freqs)
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, syms in word_syms.items():
        for p in zip(syms, syms[1:]):
            pair_words.setdefault(p, set()).add(w)

    merges: list[tuple[str, str]] = []
    while len(vocab) < vocab_size and counts:
        # deterministic argmax: count desc, pair asc
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        vocab.setdefault(merged, len(vocab))
        for w in list(pair_words.get(best, ())):
            syms = word_syms[w]
            f = freqs[w]
            # remove w's old pair contributions
            for p in zip(syms, syms[1:]):
                counts[p] -= f
                if counts[p] <= 0:
                    counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        pair_words.pop(p, None)
            # rewrite the symbol stream with the merge applied
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            word_syms[w] = out
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(w)
    return BpeModel(merges=merges, vocab=vocab, min_retained_freq=min_retained)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the learned merges to one word (lowest rank first —
    exactly the training order, so training words round-trip)."""
    syms = list(word) + [WORD_END]
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        rank, _ = min(ranked)
        a, b = next(p for p in pairs if ranks.get(p) == rank)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
) -> DataFrame:
    """Add ``bpe_tokens array<string>``, ``bpe_ids array<int>`` and
    ``n_bpe_tokens`` columns. Broadcast model, ``mapInPandas`` with a
    per-batch word cache; unknown symbols (characters outside the
    training alphabet) get id -1 rather than raising."""
    import re

    from pyspark.sql import types as T

    spark = df.sparkSession
    b_model = spark.sparkContext.broadcast(
        (model.merges, model.vocab)
    )
    token_re = re.compile(BPE_TOKEN_RE)

    # fresh StructType: StructType.add mutates in place, and sharing
    # the input DataFrame's schema object corrupts its analysis
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("bpe_ids", T.ArrayType(T.IntegerType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        merges, vocab = b_model.value
        ranks = {p: i for i, p in enumerate(merges)}
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            toks: list[str] = []
            for w in token_re.findall(text or ""):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks
            pdf["bpe_ids"] = toks.map(
                lambda ts: [vocab.get(t, -1) for t in ts]
            )
            pdf["n_bpe_tokens"] = toks.map(len).astype("int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def tokenize_corpus(
    docs: DataFrame,
    out_root: str,
    seq_len: int = 2048,
    vocab_size: int = 8192,
    shard_col: str = "source",
    max_words: int = 1_000_000,
) -> BpeModel:
    """The terminal pipeline stage: train a tokenizer on the prepared
    corpus, encode it, pack into exact ``seq_len`` training sequences,
    and write the artifacts —

    - ``<out_root>/sequences``: (shard, seq_id, token_ids) parquet,
      partitioned by shard
    - ``<out_root>/tokenizer/merges``: the (rank, left, right) merge
      table, and ``<out_root>/tokenizer/vocab``: (symbol, id) — the
      pair fully reconstructs the tokenizer via ``load_model``

    The eos/document-separator id is ``len(model.vocab)`` — one past
    the learned symbols. Docs without ``shard_col`` pack as one
    shard."""
    import os

    from .pack import pack_token_ids

    spark = docs.sparkSession
    model = train_bpe(docs, vocab_size=vocab_size, max_words=max_words)
    if shard_col not in docs.columns:
        docs = docs.withColumn(shard_col, F.lit("all"))
    enc = bpe_encode(docs, model)
    packed = pack_token_ids(
        enc, seq_len, eos_id=len(model.vocab), shard_col=shard_col
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_root, "sequences")
    )
    merges_table(spark, model).write.mode("overwrite").parquet(
        os.path.join(out_root, "tokenizer", "merges")
    )
    spark.createDataFrame(
        list(model.vocab.items()), "symbol string, id int"
    ).write.mode("overwrite").parquet(
        os.path.join(out_root, "tokenizer", "vocab")
    )
    return model


def load_model(spark: SparkSession, out_root: str) -> BpeModel:
    """Reload a tokenizer written by ``tokenize_corpus``."""
    import os

    merges = [
        (r["left"], r["right"])
        for r in spark.read.parquet(
            os.path.join(out_root, "tokenizer", "merges")
        )
        .orderBy("rank")
        .collect()
    ]
    vocab = {
        r["symbol"]: r["id"]
        for r in spark.read.parquet(
            os.path.join(out_root, "tokenizer", "vocab")
        ).collect()
    }
    return BpeModel(merges=merges, vocab=vocab)


def merges_table(spark: SparkSession, model: BpeModel) -> DataFrame:
    """The learned merges as a DataFrame ``(rank, left, right)`` —
    the persistable artifact a 100 TB encode job broadcasts."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(model.merges)],
        "rank int, left string, right string",
    )
