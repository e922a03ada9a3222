"""Learned-BPE tokenizer: training argmax order, determinism under
repartitioning, encode round-trip, distributed encode plumbing."""

import pytest

from carbon_clickhouse_spark.datapipe import bpe


SENNRICH = (
    [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
)


@pytest.fixture(scope="module")
def corpus(spark):
    # one document per word occurrence — exercises the corpus-side
    # word_frequencies aggregation, not a pre-counted table
    rows = [(f"d{i}_{w}", w) for w, n in SENNRICH for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_word_frequencies(spark, corpus):
    got = {
        r["word"]: r["freq"]
        for r in bpe.word_frequencies(corpus).collect()
    }
    assert got == dict(SENNRICH)


def test_word_frequencies_head_is_deterministic(spark, corpus):
    rows = bpe.word_frequencies(corpus, max_words=2).collect()
    # freq desc, word asc: newest(6), low(5)
    assert [(r["word"], r["freq"]) for r in rows] == [
        ("newest", 6), ("low", 5)
    ]


def test_first_merges_match_sennrich(spark, corpus):
    model = bpe.train_bpe(corpus, vocab_size=len(set("lowernwidst")) + 1 + 4)
    # alphabet + </w> first; then the ACL-2016 worked example:
    # (e,s) count 9 from newest+widest, then (es,t) 9, (est,</w>) 9,
    # then (l,o) 7 from low+lower
    assert model.merges[:4] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")
    ]


def test_training_is_layout_independent(spark, corpus):
    m1 = bpe.train_bpe(corpus, vocab_size=30)
    m2 = bpe.train_bpe(corpus.repartition(7, "doc_id"), vocab_size=30)
    assert m1.merges == m2.merges
    assert m1.vocab == m2.vocab


def test_encode_word_round_trip(spark, corpus):
    model = bpe.train_bpe(corpus, vocab_size=40)
    for w, _ in SENNRICH:
        toks = bpe.encode_word(w, model.ranks)
        assert "".join(toks) == w + bpe.WORD_END
    # unseen word still encodes (falls back toward characters)
    toks = bpe.encode_word("lowest", model.ranks)
    assert "".join(toks) == "lowest" + bpe.WORD_END


def test_bpe_encode_distributed(spark, corpus):
    model = bpe.train_bpe(corpus, vocab_size=40)
    out = bpe.bpe_encode(corpus, model).where("text = 'newest'").head()
    assert "".join(out["bpe_tokens"]) == "newest" + bpe.WORD_END
    assert out["n_bpe_tokens"] == len(out["bpe_tokens"])
    assert all(i >= 0 for i in out["bpe_ids"])
    # fully-merged frequent word: few tokens
    assert len(out["bpe_tokens"]) <= 2


def test_bpe_encode_unknown_symbol_gets_minus_one(spark, corpus):
    model = bpe.train_bpe(corpus, vocab_size=40)
    df = spark.createDataFrame([("x", "low ζ")], "doc_id string, text string")
    row = bpe.bpe_encode(df, model).head()
    assert -1 in row["bpe_ids"]  # ζ not in training alphabet
    assert "".join(row["bpe_tokens"]).startswith("low")


def test_vocab_grows_one_per_merge(spark, corpus):
    m = bpe.train_bpe(corpus, vocab_size=35)
    alphabet = len(set("".join(w for w, _ in SENNRICH))) + 1  # + </w>
    assert len(m.vocab) == alphabet + len(m.merges)
    assert len(m.vocab) <= 35


def test_merges_table(spark, corpus):
    m = bpe.train_bpe(corpus, vocab_size=34)
    t = bpe.merges_table(spark, m)
    rows = t.orderBy("rank").collect()
    assert [(r["left"], r["right"]) for r in rows] == m.merges


def test_min_freq_floor_reported(spark, corpus):
    m = bpe.train_bpe(corpus, vocab_size=30, max_words=3)
    # lowest retained frequency is the floor of what informed training
    assert m.min_retained_freq == 3  # widest(3) kept, lower(2) dropped
