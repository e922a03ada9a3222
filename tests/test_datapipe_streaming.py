"""Streaming corpus ingest (datapipe/streaming.py): quality/language
filtering, audited rejects, cross-batch content dedup, and the
bounded-state watermark dedup recipe."""

import json
import os

from carbon_clickhouse_spark.datapipe.streaming import (
    CorpusStreamConfig,
    dedup_within_watermark,
    document_stream,
    start_corpus_ingest,
)

GOOD = (
    "the cat sat on the mat and then the dog sat on the mat as well "
    "and it is a fine day in the garden of the house"
)
GOOD2 = (
    "a quick brown fox jumps over the lazy dog and the day is long "
    "in the field of the farm and the sun is warm"
)


def _write_docs(landing, name, docs):
    tmp = os.path.join(landing, f".{name}.tmp")
    with open(tmp, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    os.rename(tmp, os.path.join(landing, name))


def test_corpus_ingest_filters_and_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "corpus_root")
    os.makedirs(landing)
    _write_docs(
        landing,
        "wave1.json",
        [
            {"doc_id": 1, "text": GOOD, "lang": "en", "source": "s1"},
            # exact duplicate content, higher doc_id -> deduped away
            {"doc_id": 2, "text": GOOD, "lang": "en", "source": "s1"},
            # too short -> rejected with reason
            {"doc_id": 3, "text": "tiny", "lang": "en", "source": "s1"},
        ],
    )
    cfg = CorpusStreamConfig(
        root=root, min_tokens=10, min_stopword_ratio=0.05
    )
    docs = document_stream(spark, landing)
    q = start_corpus_ingest(spark, docs, cfg)
    try:
        q.processAllAvailable()
        assert q.exception() is None
        corpus = spark.read.parquet(os.path.join(root, "corpus"))
        assert [r.doc_id for r in corpus.collect()] == [1]
        row = corpus.first()
        assert row.lang_pred == "en" and row.n_tokens > 10
        rej = spark.read.parquet(os.path.join(root, "rejected"))
        assert {(r.doc_id, r.reason) for r in rej.collect()} == {
            (3, "too_few_tokens")
        }

        # wave 2: duplicate of stored content + one new doc
        _write_docs(
            landing,
            "wave2.json",
            [
                {"doc_id": 4, "text": GOOD, "lang": "en", "source": "s2"},
                {"doc_id": 5, "text": GOOD2, "lang": "en", "source": "s2"},
            ],
        )
        q.processAllAvailable()
        assert q.exception() is None
        corpus = spark.read.parquet(os.path.join(root, "corpus"))
        assert sorted(r.doc_id for r in corpus.collect()) == [1, 5]
        hashes = spark.read.parquet(os.path.join(root, "hashes"))
        assert hashes.count() == 2  # one key per distinct kept content
    finally:
        q.stop()


def test_corpus_language_filter(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "root")
    os.makedirs(landing)
    _write_docs(
        landing,
        "w.json",
        [
            {"doc_id": 1, "text": GOOD, "lang": "en", "source": "s"},
            {"doc_id": 2,
             "text": "el la de que y en los " * 4,
             "lang": "es", "source": "s"},
        ],
    )
    cfg = CorpusStreamConfig(root=root, languages=("en",))
    q = start_corpus_ingest(spark, document_stream(spark, landing), cfg)
    try:
        q.processAllAvailable()
        assert q.exception() is None
        corpus = spark.read.parquet(os.path.join(root, "corpus"))
        assert [r.doc_id for r in corpus.collect()] == [1]
        rej = spark.read.parquet(os.path.join(root, "rejected"))
        assert {(r.doc_id, r.reason) for r in rej.collect()} == {
            (2, "language")
        }
    finally:
        q.stop()


def test_dedup_within_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _write_docs(
        landing,
        "w.json",
        [
            {"doc_id": 1, "text": GOOD, "ts": "2024-01-01T00:00:00Z"},
            {"doc_id": 2, "text": GOOD, "ts": "2024-01-01T00:01:00Z"},
            {"doc_id": 3, "text": GOOD2, "ts": "2024-01-01T00:02:00Z"},
        ],
    )
    docs = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .json(landing)
    )
    out = dedup_within_watermark(docs, delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wmdedup")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
        got = sorted(
            r.doc_id for r in spark.sql("SELECT * FROM wmdedup").collect()
        )
        assert got == [1, 3]
    finally:
        q.stop()


def test_read_corpus_replay_dedup(spark, tmp_path):
    """read_corpus collapses the physical duplicates a crash-replayed
    micro-batch can leave in the corpus files (lowest doc_id wins)."""
    import pyspark.sql.functions as F

    from carbon_clickhouse_spark.datapipe.streaming import read_corpus

    root = str(tmp_path / "root")
    rows = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).withColumn("content_hash", F.md5("text"))
    rows.write.mode("append").parquet(root + "/corpus")
    # simulate a replayed batch: same content re-appended, plus a
    # same-content row under a different doc_id
    replay = spark.createDataFrame(
        [(1, "alpha"), (7, "beta")], "doc_id long, text string"
    ).withColumn("content_hash", F.md5("text"))
    replay.write.mode("append").parquet(root + "/corpus")
    out = {r.doc_id for r in read_corpus(spark, root).collect()}
    assert out == {1, 2}


def test_corpus_ingest_url_first_seen_dedup(spark, tmp_path):
    """Cross-batch first-seen URL dedup (r12): a re-crawl of the same
    canonical URL drops even when its CONTENT CHANGED (the pass
    content dedup cannot make), tracking-param/case/www variants
    collide, NULL urls always pass, and a genuinely new URL with
    duplicate-free content survives."""
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "corpus_root")
    os.makedirs(landing)
    _write_docs(
        landing,
        "wave1.json",
        [
            {"doc_id": 1, "text": GOOD, "lang": "en", "source": "s1",
             "url": "http://example.com/a?b=1"},
            # same canonical URL in the SAME batch (tracking params):
            # lowest doc_id wins even though the content differs
            {"doc_id": 2, "text": GOOD2, "lang": "en", "source": "s1",
             "url": "HTTP://WWW.Example.com:80/a/?utm_source=x&b=1"},
            {"doc_id": 3, "text": GOOD2 + " more", "lang": "en",
             "source": "s1", "url": None},  # NULL url passes
        ],
    )
    cfg = CorpusStreamConfig(root=root, url_col="url", dedup=False)
    docs = document_stream(
        spark, landing,
        schema="doc_id long, text string, lang string, source string,"
               " url string",
    )
    q = start_corpus_ingest(spark, docs, cfg)
    try:
        q.processAllAvailable()
        assert q.exception() is None
        corpus = spark.read.parquet(os.path.join(root, "corpus"))
        assert sorted(r.doc_id for r in corpus.collect()) == [1, 3]
        assert "__url_key" not in corpus.columns

        # wave 2: re-crawl of the stored URL with NEW content ->
        # dropped; a new URL survives; another NULL url passes
        _write_docs(
            landing,
            "wave2.json",
            [
                {"doc_id": 4, "text": GOOD + " updated content",
                 "lang": "en", "source": "s2",
                 "url": "http://example.com/a?b=1&gclid=z"},
                {"doc_id": 5, "text": GOOD2, "lang": "en",
                 "source": "s2", "url": "http://example.com/b"},
                {"doc_id": 6, "text": GOOD2 + " null again",
                 "lang": "en", "source": "s2", "url": None},
            ],
        )
        q.processAllAvailable()
        assert q.exception() is None
        corpus = spark.read.parquet(os.path.join(root, "corpus"))
        assert sorted(r.doc_id for r in corpus.collect()) == [1, 3, 5, 6]
        urls = spark.read.parquet(os.path.join(root, "urls"))
        # one key per distinct canonical URL seen (a, b)
        assert urls.distinct().count() == 2
    finally:
        q.stop()
