"""Streaming training-corpus ingest — the document analog of the
metrics pipeline in ``streaming/ingest.py``.

The reference engine streams metric points from landing files into
durable tables with cross-batch series dedup (``receiver/base.go``
feeding ``uploader/``); a training-data pipeline streams *documents*
with the same shape: file-source ``readStream`` -> stateless
feature/filter stages (quality, language, token counts — pure column
expressions, no Python) -> one transactional ``foreachBatch`` append
with cross-batch CONTENT dedup. The dedup side-table holds only
16-byte md5 keys; the anti-join runs key-vs-key and the surviving
key set (bounded by the micro-batch) broadcasts back onto the text
rows, so document text never crosses the wire — the exists-cache
idea (``streaming/exists_cache.py``) applied to content instead of
series names.

Scale: every stage is stateless column work except the hash
anti-join, whose stored side is pruned to the key column; at 100 TB
the hashes table is ~0.2% of the corpus and AQE broadcasts recent
slivers. Rejected rows land in an audited ``rejected`` table with a
reason column (the F5 dropped-sample audit, for documents).

For event-time streams (documents carrying a timestamp), Spark's
native ``dropDuplicatesWithinWatermark`` gives bounded-state exact
dedup without a side table — :func:`dedup_within_watermark` wraps
the recipe.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from .text import language_id, quality_features

#: schema of the landing documents (json-lines files)
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string"
)

_locks: dict[str, threading.Lock] = {}
_locks_guard = threading.Lock()


def _lock(path: str) -> threading.Lock:
    with _locks_guard:
        return _locks.setdefault(path, threading.Lock())


@dataclass
class CorpusStreamConfig:
    """Knobs for :func:`start_corpus_ingest`."""

    root: str
    checkpoint: str | None = None
    #: minimum stopword ratio (the cheap fluency proxy); None = keep all
    min_stopword_ratio: float | None = None
    #: minimum token count; None = keep all
    min_tokens: int | None = None
    #: keep only these predicted languages; None/empty = keep all
    languages: tuple[str, ...] = field(default_factory=tuple)
    #: cross-batch exact content dedup via the hashes side table
    dedup: bool = True
    #: when set, the incoming stream's URL column drives cross-batch
    #: FIRST-SEEN URL dedup over text.canonical_url (r12): a
    #: re-crawl of the same page — differing tracking params, case,
    #: default port, even UPDATED CONTENT — drops in favor of the
    #: first crawl, the complementary pass to content dedup (which
    #: catches same-content-different-URL). Rows with a NULL url
    #: always pass. Side table: 16-byte md5(canonical) keys only.
    url_col: str | None = None
    trigger: str = "1 second"
    audit_rejected: bool = True


def document_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files: int = 64,
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """File-source stream of json-lines documents (the landing-zone
    contract: producers atomically rename complete files in, same as
    the metrics receivers). ``schema`` extends the landing contract
    (e.g. ``DOC_SCHEMA + ", url string"`` for URL-carrying crawls
    feeding ``CorpusStreamConfig.url_col``)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .json(landing_dir)
    )


def _featurize(batch: DataFrame) -> DataFrame:
    """Stateless per-document stages: quality features + language ID
    + content hash. Pure column expressions — whole-stage codegen."""
    out = language_id(quality_features(batch))
    return out.withColumn("content_hash", F.md5(F.col("text")))


def _reject_reason(cfg: CorpusStreamConfig):
    """NULL = keep; else the first matching reject reason (evaluated
    in filter order, mirroring the metrics drop-rule audit)."""
    reason = F.lit(None).cast("string")
    checks = []
    if cfg.min_tokens is not None:
        checks.append(
            (F.col("n_tokens") < cfg.min_tokens, "too_few_tokens")
        )
    if cfg.min_stopword_ratio is not None:
        checks.append(
            (
                F.col("stopword_ratio") < cfg.min_stopword_ratio,
                "low_stopword_ratio",
            )
        )
    if cfg.languages:
        checks.append(
            (~F.col("lang_pred").isin(list(cfg.languages)), "language")
        )
    for cond, label in reversed(checks):
        reason = F.when(cond, F.lit(label)).otherwise(reason)
    return reason


def start_corpus_ingest(
    spark: SparkSession, docs: DataFrame, cfg: CorpusStreamConfig
) -> StreamingQuery:
    """Start the corpus ingest stream: streaming documents ->
    ``<root>/corpus`` (kept rows + features), ``<root>/hashes``
    (16-byte dedup keys), ``<root>/rejected`` (audited drops with
    reasons).

    Restart semantics: the corpus append runs BEFORE the hashes
    append, so a crash between the two and the checkpoint replay can
    duplicate a batch's rows in the corpus files — never lose them
    (hashes-first would silently drop the batch on replay). Duplicates
    are resolved at read time by :func:`read_corpus`, the same
    ReplacingMergeTree read-view discipline the metrics tables use
    (``operators/dedup.py``).
    """
    checkpoint = cfg.checkpoint or os.path.join(cfg.root, "_checkpoint")
    corpus_path = os.path.join(cfg.root, "corpus")
    hashes_path = os.path.join(cfg.root, "hashes")
    urls_path = os.path.join(cfg.root, "urls")
    rejected_path = os.path.join(cfg.root, "rejected")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        feats = _featurize(batch).withColumn("reason", _reject_reason(cfg))
        feats = feats.persist()
        try:
            if cfg.audit_rejected:
                rejected = feats.filter(F.col("reason").isNotNull())
                with _lock(rejected_path):
                    rejected.write.mode("append").parquet(rejected_path)
            kept = feats.filter(F.col("reason").isNull()).drop("reason")
            if cfg.url_col:
                # first-seen URL dedup BEFORE content dedup: the
                # canonical form collides across re-crawl variants
                # even when the content changed; within-batch the
                # lowest doc_id wins (deterministic), cross-batch the
                # stored 16-byte md5(canonical) keys anti-join —
                # NULL-url rows always pass (nothing to collide on)
                from .text import canonical_url

                from pyspark.sql import Window

                kept = kept.withColumn(
                    "__url_key", F.md5(canonical_url(cfg.url_col))
                )
                w_u = Window.partitionBy("__url_key").orderBy("doc_id")
                kept = (
                    kept.withColumn("__rk", F.row_number().over(w_u))
                    .filter(
                        F.col("__url_key").isNull()
                        | (F.col("__rk") == 1)
                    )
                    .drop("__rk")
                )
                if _exists(spark_b, urls_path):
                    stored_u = spark_b.read.parquet(urls_path).select(
                        "__url_key"
                    )
                    nulls = kept.filter(F.col("__url_key").isNull())
                    keyed = kept.filter(F.col("__url_key").isNotNull())
                    fresh_u = (
                        keyed.select("__url_key")
                        .distinct()
                        .join(stored_u, "__url_key", "left_anti")
                    )
                    kept = keyed.join(
                        F.broadcast(fresh_u), "__url_key", "left_semi"
                    ).unionByName(nulls)
            if cfg.dedup:
                # within-batch: first doc_id per content hash wins
                # (deterministic); cross-batch: anti-join the stored
                # 16-byte keys
                from pyspark.sql import Window

                w = Window.partitionBy("content_hash").orderBy("doc_id")
                kept = (
                    kept.withColumn("__rk", F.row_number().over(w))
                    .filter(F.col("__rk") == 1)
                    .drop("__rk")
                )
                if _exists(spark_b, hashes_path):
                    # anti-join 16-byte keys only, then broadcast the
                    # surviving key set (bounded by the micro-batch)
                    # back onto the text rows — document text never
                    # crosses the wire, the exists-cache shape of
                    # streaming/ingest.py applied to content
                    stored = spark_b.read.parquet(hashes_path).select(
                        "content_hash"
                    )
                    fresh = (
                        kept.select("content_hash")
                        .distinct()
                        .join(stored, "content_hash", "left_anti")
                    )
                    kept = kept.join(
                        F.broadcast(fresh), "content_hash", "left_semi"
                    )
            kept = kept.persist()
            try:
                with _lock(corpus_path):
                    kept.drop("__url_key").write.mode("append").parquet(
                        corpus_path
                    )
                if cfg.dedup:
                    with _lock(hashes_path):
                        kept.select("content_hash").write.mode(
                            "append"
                        ).parquet(hashes_path)
                if cfg.url_col:
                    # corpus-before-keys, same crash discipline as
                    # the content hashes (duplicates resolve at read)
                    with _lock(urls_path):
                        kept.filter(
                            F.col("__url_key").isNotNull()
                        ).select("__url_key").write.mode(
                            "append"
                        ).parquet(urls_path)
            finally:
                kept.unpersist()
        finally:
            feats.unpersist()

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=cfg.trigger)
        .start()
    )


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    """The corpus read view: physical duplicates from a replayed
    micro-batch (see :func:`start_corpus_ingest`) collapse to one row
    per content hash, lowest doc_id winning — deterministic, the
    replacing-dedup discipline applied to documents."""
    from pyspark.sql import Window

    df = spark.read.parquet(os.path.join(root, "corpus"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def _exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:  # noqa: BLE001 — AnalysisException: no table yet
        return False


def dedup_within_watermark(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Bounded-state exact dedup for event-time document streams:
    Spark's native ``dropDuplicatesWithinWatermark`` keeps each key's
    state only until the watermark passes ``delay`` — the stream
    never accumulates unbounded dedup state, the property that makes
    exact dedup viable on an always-on 100 TB/day feed. Keys default
    to the md5 of the text (content identity)."""
    if key_cols is None:
        docs = docs.withColumn("content_hash", F.md5(F.col("text")))
        key_cols = ["content_hash"]
    return docs.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
