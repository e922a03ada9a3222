"""Bigram-LM perplexity scoring (datapipe.lm) and the Gopher
quality-rule filter (datapipe.text.gopher_rules)."""

import math

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.lm import (
    BOS,
    perplexity_buckets,
    score_perplexity,
    train_bigram_lm,
)
from carbon_clickhouse_spark.datapipe.text import filter_gopher, gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_train_counts_and_vocab_cap(spark):
    ref = _docs(spark, [("r1", "the cat sat"), ("r2", "the cat ran")])
    lm = train_bigram_lm(ref, vocab_size=3, add_k=0.1)
    # top-3 by count, ties broken on token: the(2) cat(2) ran/sat ->
    # 'ran' wins the tie alphabetically
    uni = {r["word"]: r["u_count"] for r in lm.unigrams.collect()}
    assert uni == {"the": 2, "cat": 2, "ran": 1}
    assert lm.total == 6 and lm.vocab == 4
    bi = {
        (r["prev"], r["word"]): r["b_count"] for r in lm.bigrams.collect()
    }
    assert bi[(BOS, "the")] == 2 and bi[("the", "cat")] == 2
    assert bi[("cat", "sat")] == 1 and bi[("cat", "ran")] == 1


def test_perplexity_exact_arithmetic(spark):
    ref = _docs(spark, [("r1", "a b"), ("r2", "a b")])
    lm = train_bigram_lm(ref, add_k=0.5, lam=0.75)
    # model: total=4, vocab=3 (a, b, UNK); c(a)=2 c(b)=2
    # doc "a b": pair (<s>, a) -> p_bi=0 (BOS has no context count),
    #   p = 0.25 * p_uni(a) = 0.25 * (2+0.5)/(4+1.5)
    # pair (a, b) -> p = 0.75 * (2/2) + 0.25 * p_uni(b)
    p_uni = (2 + 0.5) / (4 + 1.5)
    p1 = 0.25 * p_uni
    p2 = 0.75 + 0.25 * p_uni
    expect = math.exp(-(math.log(p1) + math.log(p2)) / 2)
    got = score_perplexity(
        _docs(spark, [("d", "a b")]), lm
    ).collect()[0]
    assert got["n_tokens"] == 2
    assert got["perplexity"] == pytest.approx(expect)


def test_oov_scores_finite_and_worse(spark):
    ref = _docs(spark, [("r1", "x " * 50)])
    lm = train_bigram_lm(ref)
    scored = score_perplexity(
        _docs(spark, [("in", "x x x"), ("oov", "zq wv pk")]), lm
    )
    got = {r["doc_id"]: r["perplexity"] for r in scored.collect()}
    assert all(math.isfinite(v) for v in got.values())
    assert got["oov"] > got["in"]


def test_perplexity_buckets(spark):
    ref = _docs(spark, [("r", "the quick brown fox jumps " * 20)])
    lm = train_bigram_lm(ref)
    docs = _docs(
        spark,
        [
            ("good", "the quick brown fox jumps the quick brown fox"),
            ("mid", "the quick zebra sleeps now"),
            ("bad", "zzz qqq www eee rrr"),
        ],
    )
    banded = perplexity_buckets(score_perplexity(docs, lm))
    bands = {r["doc_id"]: r["band"] for r in banded.collect()}
    assert bands == {"good": "head", "mid": "middle", "bad": "tail"}


def test_gopher_rules_flags(spark):
    ok_text = ("the cat sat on the mat with a dog and that bird have fun "
               "to be here ") * 5
    rows = [
        ("ok", ok_text),
        ("short", "too short"),
        ("symbols", "# " * 60),
        ("bullets", "\n".join("- item %d foo" % i for i in range(60))),
        ("noalpha", "123 456 " * 30),
    ]
    out = gopher_rules(_docs(spark, rows))
    got = {r["doc_id"]: (r["gopher_pass"], set(r["gopher_reasons"]))
           for r in out.collect()}
    assert got["ok"] == (True, set())
    assert not got["short"][0] and "word_count" in got["short"][1]
    assert not got["symbols"][0] and "symbol_ratio" in got["symbols"][1]
    assert not got["bullets"][0] and "bullet_lines" in got["bullets"][1]
    assert not got["noalpha"][0] and "alpha_words" in got["noalpha"][1]
    kept = filter_gopher(_docs(spark, rows))
    assert [r["doc_id"] for r in kept.collect()] == ["ok"]
    assert kept.columns == ["doc_id", "text"]


def test_gopher_zero_shuffle_plan(spark):
    df = _docs(spark, [("d", "hello world")])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
