"""The reuse-materialization strategy knob (r13, VERDICT r12 #6):
``SPARK_GRAFT_MATERIALIZE`` selects HOW a shared intermediate is
reused (lazy localCheckpoint / persist / reliable checkpoint / none),
and must never change WHAT any consumer computes. Pinned here on the
LSH pair generator — the knob's heaviest consumer family — plus the
helper's own contract."""

import os

import pytest

from carbon_clickhouse_spark.materialize import materialize


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "the quick brown fox jumps over the lazy dog again"),
        (3, "a completely different document about spark shuffles"),
        (4, "a completely different document about spark shuffles"),
        (5, "unique text with no duplicate partner in this corpus"),
        (6, "the quick brown fox jumps over the lazy cat again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(docs):
    from carbon_clickhouse_spark.datapipe.dedup import minhash_lsh_pairs

    return sorted(
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    )


def test_all_strategies_identical_rows(docs, monkeypatch, tmp_path):
    docs.sparkSession.sparkContext.setCheckpointDir(
        str(tmp_path / "ckpt")
    )
    results = {}
    for mode in ("local_checkpoint", "persist", "checkpoint", "none"):
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)
        results[mode] = _pairs(docs)
    assert len({tuple(v) for v in results.values()}) == 1, results
    assert results["local_checkpoint"], "fixture must produce pairs"


def test_default_is_local_checkpoint(docs, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    out = materialize(docs)
    # lazy localCheckpoint plans as a materialized-RDD scan
    assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()


def test_persist_keeps_lineage_and_caches(docs, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    out = materialize(docs)
    assert out.storageLevel.useMemory  # marked for caching
    out.unpersist()


def test_invalid_mode_raises(docs, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        materialize(docs)


def test_none_mode_passthrough(docs, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "none")
    assert materialize(docs) is docs
