"""Deterministic corpus mixing: plan arithmetic, realized shares,
upsampling epochs, layout independence."""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.mix import (
    mix_sources,
    mixture_plan,
    source_token_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for s, n in (("web", 400), ("books", 100), ("code", 50)):
        rows += [(f"{s}-{i:04d}", s, 10) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_tokens int"
    )


def test_token_counts(corpus):
    assert source_token_counts(corpus) == {
        "web": 4000, "books": 1000, "code": 500
    }


def test_mixture_plan_no_upsampling_default():
    avail = {"web": 4000, "books": 1000, "code": 500}
    plan = mixture_plan(avail, {"web": 0.5, "books": 0.3, "code": 0.2})
    # binding source: code (0.2 share from 500 toks -> total 2500)
    assert plan["code"] == pytest.approx(1.0)
    assert plan["web"] == pytest.approx(0.5 * 2500 / 4000)
    assert plan["books"] == pytest.approx(0.3 * 2500 / 1000)
    assert all(r <= 1.0 + 1e-9 for r in plan.values())


def test_mixture_plan_explicit_total_upsamples():
    avail = {"web": 4000, "books": 1000}
    plan = mixture_plan(avail, {"web": 0.5, "books": 0.5}, total_tokens=5000)
    assert plan["books"] == pytest.approx(2.5)  # 2 repeats + half
    assert plan["web"] == pytest.approx(0.625)


def test_mix_realized_shares(corpus):
    mixed = mix_sources(
        corpus, {"web": 0.5, "books": 0.3, "code": 0.2}
    )
    got = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    total = sum(got.values())
    # document-granular sampling: shares within a few % of the plan
    assert got["code"] == 500  # rate 1.0 keeps everything
    assert abs(got["web"] / total - 0.5) < 0.05
    assert abs(got["books"] / total - 0.3) < 0.05


def test_mix_upsampling_epochs(corpus):
    mixed = mix_sources(
        corpus, {"books": 1.0}, total_tokens=2500
    )  # 2.5x books
    epochs = {
        r["epoch"]: r["n"]
        for r in mixed.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    assert epochs[0] == 100 and epochs[1] == 100  # two full copies
    assert 30 <= epochs[2] <= 70  # ~50% deterministic slice
    # repeats are exact copies apart from the epoch stamp
    ids0 = {r["doc_id"] for r in mixed.filter("epoch = 0").collect()}
    ids1 = {r["doc_id"] for r in mixed.filter("epoch = 1").collect()}
    assert ids0 == ids1
    # the fractional slice is epoch-decorrelated but deterministic
    ids2 = {r["doc_id"] for r in mixed.filter("epoch = 2").collect()}
    assert ids2 < ids0


def test_mix_layout_and_seed_determinism(corpus):
    a = mix_sources(corpus, {"web": 0.7, "code": 0.3}, seed=1)
    b = mix_sources(
        corpus.repartition(13), {"web": 0.7, "code": 0.3}, seed=1
    )
    key = lambda df: sorted(
        (r["doc_id"], r["epoch"]) for r in df.collect()
    )
    assert key(a) == key(b)
    c = mix_sources(corpus, {"web": 0.7, "code": 0.3}, seed=2)
    assert key(a) != key(c)  # different seed, different slice


def test_mix_zero_weight_drops_source(corpus):
    mixed = mix_sources(corpus, {"web": 1.0})
    assert {r["source"] for r in mixed.select("source").distinct().collect()} == {
        "web"
    }


def test_mix_rejects_empty_weights(corpus):
    with pytest.raises(ValueError):
        mix_sources(corpus, {"nope": 1.0})


def test_empty_weighted_source_does_not_zero_the_mixture():
    from carbon_clickhouse_spark.datapipe.mix import mixture_plan

    plan = mixture_plan({"a": 1000, "b": 0}, {"a": 0.5, "b": 0.5})
    assert plan == {"a": 1.0, "b": 0.0}
    with pytest.raises(ValueError):
        mixture_plan({"b": 0}, {"b": 1.0})


def test_temperature_weights_rebalance():
    import math

    import pytest

    from carbon_clickhouse_spark.datapipe.mix import (
        mixture_plan,
        temperature_weights,
    )

    avail = {"web": 1_000_000, "books": 10_000, "code": 0}
    # alpha=1: natural proportions
    w1 = temperature_weights(avail, alpha=1.0)
    assert w1["web"] == pytest.approx(1_000_000 / 1_010_000)
    assert w1["code"] == 0.0
    # alpha=0: uniform over non-empty sources
    w0 = temperature_weights(avail, alpha=0.0)
    assert w0["web"] == pytest.approx(0.5) and w0["books"] == pytest.approx(0.5)
    # alpha=0.3 sits between, and the exponent is exact
    w = temperature_weights(avail, alpha=0.3)
    z = 1_000_000**0.3 + 10_000**0.3
    assert w["books"] == pytest.approx(10_000**0.3 / z)
    assert w0["books"] > w["books"] > w1["books"]
    # composing with mixture_plan: auto-sizing makes the small source
    # the binding one (rate -> 1, no upsampling by design) ...
    rates = mixture_plan(avail, w)
    assert rates["books"] == pytest.approx(1.0, abs=1e-3)
    assert rates["web"] < 0.1
    # ... and an explicit token budget upsamples it via epoch repeats
    rates2 = mixture_plan(avail, w, total_tokens=60_000)
    assert rates2["books"] > 1.0 > rates2["web"]
    # book tokens wanted / web tokens wanted matches the weight ratio
    got = (rates2["books"] * 10_000) / (rates2["web"] * 1_000_000)
    assert got == pytest.approx(w["books"] / w["web"])
    with pytest.raises(ValueError):
        temperature_weights(avail, alpha=1.5)
    with pytest.raises(ValueError):
        temperature_weights({"empty": 0})


def test_null_source_contributes_nothing_without_crashing(spark):
    """r11: a NULL source can never be named in the weights, so it
    contributes nothing — but its presence must not crash the plan's
    source ordering (None < str TypeError pre-r11)."""
    rows = [
        (i, "word " * (1 + i % 5), f"s{i % 2}", 5) for i in range(20)
    ] + [(99, "null src", None, 2)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_tokens int"
    )
    out = mix_sources(df, {"s0": 0.5, "s1": 0.5}).collect()
    assert len(out) > 0
    assert all(r["source"] is not None for r in out)


def test_empty_corpus_yields_empty_mixture(spark):
    """r11 empty-input probe: an empty corpus mixes to an empty frame
    with the output schema (epoch attached), not a ValueError."""
    df = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_tokens int"
    )
    out = mix_sources(df, {"s0": 1.0})
    assert out.count() == 0
    assert "epoch" in out.columns
