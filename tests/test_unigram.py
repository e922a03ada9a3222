"""Unigram-LM tokenizer (datapipe/unigram.py): EM training over the
word table, likelihood monotonicity, prune-to-vocab, bit-deterministic
training under repartitioning, Viterbi encoding round-trip."""

import re

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.text import BPE_TOKEN_RE
from carbon_clickhouse_spark.datapipe.unigram import (
    UnigramModel,
    _viterbi,
    train_unigram,
    unigram_encode,
)

DOCS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "matting and catting",
    "the the the cat cat mat",
    "a cat a mat a hat",
    "hats and mats and cats",
] * 3


def _docs(spark, n_parts=2):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string"
    ).repartition(n_parts)


def test_train_vocab_and_chars(spark):
    m = train_unigram(_docs(spark), vocab_size=24, seed_size=200)
    assert isinstance(m, UnigramModel)
    # every corpus character survives (segmentability guarantee)
    corpus_chars = {
        c for d in DOCS for w in re.findall(BPE_TOKEN_RE, d) for c in w
    }
    assert corpus_chars <= set(m.log_probs)
    # pruned at least into the neighborhood of the target
    assert len(m.log_probs) <= max(24, len(corpus_chars)) + 24
    # high-frequency multi-char pieces survive pruning
    assert any(len(p) > 1 for p in m.log_probs)
    # probabilities are finite and negative
    assert all(p < 0 for p in m.log_probs.values())


def test_em_log_likelihood_monotone_within_rounds(spark):
    m = train_unigram(_docs(spark), vocab_size=24, seed_size=200,
                      em_iters=2)
    lls = m.em_log_likelihoods
    assert len(lls) >= 3
    # within each 2-iteration EM run, the second E-step's LL must not
    # decrease (the EM guarantee; pruning BETWEEN runs may drop it)
    for k in range(0, (len(lls) // 2) * 2, 2):
        assert lls[k + 1] >= lls[k] - 1e-6, (k, lls)


def test_training_is_partition_independent(spark):
    a = train_unigram(_docs(spark, 1), vocab_size=24, seed_size=200)
    b = train_unigram(_docs(spark, 7), vocab_size=24, seed_size=200)
    assert a.log_probs == b.log_probs  # exact float equality


def test_encode_round_trip(spark):
    docs = _docs(spark)
    m = train_unigram(docs, vocab_size=24, seed_size=200)
    out = unigram_encode(docs, m).collect()
    assert len(out) == len(DOCS)
    for r in out:
        pretokens = re.findall(BPE_TOKEN_RE, r["text"])
        # pieces concatenate back to the pre-token stream exactly
        assert "".join(r["pieces"]) == "".join(pretokens)
        assert all(p in m.log_probs for p in r["pieces"])


def test_viterbi_prefers_known_pieces(spark):
    logp = {"c": -5.0, "a": -5.0, "t": -5.0, "cat": -1.0, "at": -2.0}
    assert _viterbi("cat", logp) == ["cat"]
    assert _viterbi("catat", logp) == ["cat", "at"]
    # exclusion probe: best alternative without 'cat'
    assert _viterbi("cat", logp, exclude="cat") == ["c", "at"]


def test_unseen_character_still_segments(spark):
    m = UnigramModel(
        log_probs={"a": -1.0, "b": -1.0, "ab": -0.5},
        vocab_size=3,
        n_words_table=1,
    )
    df = spark.createDataFrame([(0, "abz ab")], "doc_id long, text string")
    out = unigram_encode(df, m).collect()[0]
    assert "".join(out["pieces"]) == "abzab"


def test_words_table_input_accepted(spark):
    words = spark.createDataFrame(
        [("aaab", 10.0), ("aab", 6.0), ("ab", 4.0)],
        "word string, freq double",
    )
    m = train_unigram(words, vocab_size=6, seed_size=50)
    assert {"a", "b"} <= set(m.log_probs)


def test_tokenize_corpus_unigram_artifacts(spark, tmp_path):
    from carbon_clickhouse_spark.datapipe.unigram import (
        load_unigram,
        tokenize_corpus_unigram,
    )

    docs = _docs(spark).withColumn(
        "source", F.lit("web")
    )
    out = str(tmp_path / "tok")
    m = tokenize_corpus_unigram(
        docs, out, seq_len=16, vocab_size=24, max_words=10_000
    )
    seqs = spark.read.parquet(f"{out}/sequences")
    rows = seqs.collect()
    assert rows and all(len(r["token_ids"]) == 16 for r in rows)
    eos = m.vocab_size
    assert all(
        all(0 <= t <= eos for t in r["token_ids"]) for r in rows
    )
    # vocab artifact reconstructs the model exactly
    m2 = load_unigram(spark, out)
    assert m2.log_probs == m.log_probs
