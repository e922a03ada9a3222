"""Training-corpus preparation: stratified sampling + sequence packing.

The last mile of a pre-training data pipeline after dedup/quality
filtering: downsample each source to a target rate, then pack the
surviving documents into fixed token-budget training sequences. Both
operators are deterministic (re-runs and different partitionings give
identical assignments), which is what makes 100 TB corpus builds
reproducible and resumable.

- Sampling keys on an md5-derived bucket of the document id — a
  content-independent hash both Spark and any SQL engine compute
  identically, so the sample is portable across engines and stable
  under re-partitioning (never ``rand()``, which is neither).
- Packing is the concat-then-chunk assignment LM pipelines use:
  within a shard (= source here), documents in id order fill
  sequences of ``budget`` tokens; a document starts in the sequence
  its running-total offset falls into. One window per shard — shards
  are the parallel unit, so the plan scales with shard count and
  never funnels the corpus through a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): first 4
    hex digits of md5 of the value's string form, mod buckets.
    (DuckDB equivalent: CAST('0x' || substr(md5(v),1,4) AS BIGINT) %
    buckets.)"""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame, rate_pct: Column, key: str = "doc_id"
) -> DataFrame:
    """Keep each row iff its hash bucket falls under the row's target
    rate (a per-row Column, e.g. derived from source): deterministic
    per-stratum downsampling with no shuffle and no RNG state."""
    return df.filter(hash_bucket(key) < rate_pct)


def pack_contiguous(
    df: DataFrame,
    budget: int,
    tok_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document a training-sequence id within its shard:
    documents in ``order_col`` order fill ``budget``-token sequences;
    ``seq_id = floor(exclusive_cumsum(tokens) / budget)``. Adds
    ``seq_id`` and ``seq_pos`` (position within the sequence).

    ``order_col`` must be unique within a shard (doc ids are) — the
    determinism guarantee is meaningless under ties. The explicit ROWS
    frame keeps the cumsum exclusive-correct even if a caller passes a
    non-unique ordering (the default RANGE frame would sum whole tie
    groups)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    excl = F.sum(tok_col).over(w) - F.col(tok_col)
    out = df.withColumn("seq_id", F.floor(excl / budget))
    wseq = Window.partitionBy(shard_col, "seq_id").orderBy(order_col)
    return out.withColumn("seq_pos", F.row_number().over(wseq).cast("long"))


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking for long-context training:
    (doc_id, chunk_idx, chunk, n_tokens) with ``overlap`` tokens
    shared between consecutive chunks.

    Pure column expressions — split once, then slice the token array
    per window (posexplode over a sequence of window starts): zero
    UDFs, zero shuffles, scales with cores. Windows advance by
    ``max_tokens - overlap``; the final window is the remainder (never
    empty, never duplicated)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... while start + overlap < n
    # (a start whose window would only repeat the previous overlap is
    # dropped; single short doc -> one chunk)
    n_windows = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_windows - 1), lambda i: i * step
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        toks.alias("__toks"),
    )
    window = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return out.select(
        "doc_id",
        "chunk_idx",
        F.array_join(window, " ").alias("chunk"),
        F.least(F.lit(max_tokens), F.col("__n") - F.col("__start")).alias(
            "n_tokens"
        ),
    )


def pack_token_ids(
    df: DataFrame,
    seq_len: int,
    eos_id: int,
    ids_col: str = "bpe_ids",
    shard_col: str = "source",
    order_col: str = "doc_id",
    keep_partial: bool = False,
) -> DataFrame:
    """GPT-style concat-and-cut packing: within each shard, document
    token streams (each terminated by ``eos_id``) concatenate in
    ``order_col`` order and are cut into EXACT ``seq_len`` sequences
    -> ``(shard, seq_id, token_ids array<int> of size seq_len)``.
    The trailing partial sequence is dropped unless ``keep_partial``.

    Plan shape (the 100 TB part): one window cumsum per shard gives
    each document its global token offset; each document then emits
    only the fragments of the sequences it overlaps (array slices —
    no token-level explode, fragment rows carry at most the doc's own
    ids); one groupBy on (shard, seq_id) reassembles fragments with
    an order-stable array_sort. Two shuffles total, both keyed small;
    tokens cross the wire once, as arrays. Deterministic under any
    partitioning because the only orderings are ``order_col`` (unique
    per shard by contract) and the in-sequence fragment offset."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    L = F.lit(seq_len)
    # null ids (e.g. an un-encodable doc) pack as the bare separator
    # rather than nulling the whole shard's offset cumsum
    ids = F.coalesce(
        F.col(ids_col).cast("array<int>"), F.array().cast("array<int>")
    )
    stream = F.concat(ids, F.array(F.lit(eos_id).cast("int")))
    n = F.size(stream)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(n).over(w) - n).alias("__start")
    doc = df.select(
        F.col(shard_col).alias("shard"),
        F.col(order_col).alias("__ord"),
        stream.alias("__ids"),
        n.alias("__n"),
        start,
    )
    first_seq = F.floor(F.col("__start") / L)
    last_seq = F.floor((F.col("__start") + F.col("__n") - 1) / L)
    frag = doc.select(
        "shard",
        F.col("__start"),
        F.col("__ids"),
        F.col("__n"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    # fragment of this doc's stream landing in sequence seq_id:
    # stream positions [lo, hi) with lo/hi clamped to the sequence
    lo = F.greatest(F.col("seq_id") * L, F.col("__start"))
    hi = F.least((F.col("seq_id") + 1) * L, F.col("__start") + F.col("__n"))
    frag = frag.select(
        "shard",
        "seq_id",
        (lo % L).alias("__pos"),  # offset inside the sequence
        F.slice(
            F.col("__ids"), (lo - F.col("__start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("__frag"),
    )
    out = (
        frag.groupBy("shard", "seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__frag"))
                    ),
                    lambda s: s["__frag"],
                )
            ).alias("token_ids")
        )
    )
    if not keep_partial:
        out = out.filter(F.size("token_ids") == seq_len)
    return out


def write_corpus_shards(
    df: DataFrame,
    root: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Deterministic sharded corpus layout for training readers:
    shard = xxhash64(doc_id) % n_shards, one parquet file per shard
    directory (``shard=<k>/``), rows sorted by doc_id within the
    shard. Re-running over the same corpus reproduces byte-identical
    shard membership — no RNG, no dependence on partition
    enumeration order. Size n_shards so one shard ~ one reader task's
    appetite (at 100 TB: thousands of shards, each still one task)."""
    out = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(root)
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    seed: int = 0,
    n_shards: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Global pseudo-random training order, reproducibly: every row
    gets ``order_key = xxhash64(seed, key)``; its shard is
    ``order_key mod n_shards``; rows are hash-repartitioned on the
    shard and sorted by (shard, order_key, key) within it. Reading
    shards in shard order yields one fixed permutation of the corpus
    — the same permutation on any cluster size, any input file
    layout, any re-run (contrast ``rand()`` or ``df.orderBy(rand)``,
    which are neither).

    Scale: one shuffle, keyed by a small int — no global sort, no
    range-boundary sampling (repartitionByRange samples rows to pick
    boundaries, which silently changes shard contents between runs).
    A new epoch is a new ``seed``. Write with
    ``.write.partitionBy("shard")`` to get per-shard files a data
    loader streams in order.

    ``portable=True`` derives the order key from md5's first 60 bits
    (the engine-portable family) instead of ``xxhash64`` — an
    external engine reproduces the exact permutation (oracle mode)."""
    if portable:
        k = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
    else:
        k = F.xxhash64(F.lit(seed).cast("long"), F.col(key))
    out = df.withColumn("order_key", k).withColumn(
        "shard", F.pmod(F.col("order_key"), F.lit(n_shards)).cast("int")
    )
    return out.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "order_key", key
    )
