"""LSH bucket-size skew guard (max_bucket_size).

The band-bucket self-join in minhash_lsh_pairs/simhash_pairs emits
O(|bucket|^2) pairs per bucket; a boilerplate corpus collapses into a
single bucket and explodes. With the cap, over-cap buckets emit star
edges to the bucket's min doc_id — these tests pin down both the
boundedness and the semantic invariants the star shortcut preserves:

- loser set ("has a smaller member in some shared bucket") identical,
  so dedup_survivors anti-join semantics are unchanged
- connected components identical (star keeps every bucket connected)
"""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.cluster import dedup_clusters
from carbon_clickhouse_spark.datapipe.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)


def _mixed_corpus(spark, n_groups=6, group=4, singles=10):
    """Duplicate groups (identical text per group) plus singletons."""
    rows = []
    i = 0
    for g in range(n_groups):
        txt = f"group {g} shared boilerplate text repeated for every member of the group {g}"
        for _ in range(group):
            rows.append((i, txt))
            i += 1
    for s in range(singles):
        rows.append((i, f"unique document {s} with its own words alpha{s} beta{s} gamma{s} delta{s}"))
        i += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_degenerate_corpus_bounded_pairs(spark):
    # 10k identical docs: uncapped would emit ~50M pairs; capped emits
    # exactly n-1 star edges (hub = min doc_id, deduped across bands)
    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text on every single page of the site").alias("text"),
    )
    pairs = minhash_lsh_pairs(df, max_bucket_size=100)
    got = pairs.agg(
        F.count("*").alias("n"),
        F.min("doc_a").alias("lo"),
        F.max("doc_a").alias("hi"),
    ).collect()[0]
    assert got.n == n - 1
    assert got.lo == 0 and got.hi == 0  # every edge points at the keeper


def test_star_edges_preserve_losers_and_clusters(spark):
    df = _mixed_corpus(spark)
    exact = minhash_lsh_pairs(df)
    # cap=2 forces EVERY multi-doc bucket through the star path
    capped = minhash_lsh_pairs(df, max_bucket_size=2)

    def losers(p):
        return {r.doc_id for r in p.select(F.col("doc_b").alias("doc_id")).distinct().collect()}

    assert losers(exact) == losers(capped)

    def clusters(p):
        out = dedup_clusters(df, p)
        return {
            frozenset(g)
            for g in out.groupBy("cluster_id")
            .agg(F.collect_set("doc_id").alias("m"))
            .select("m")
            .toPandas()["m"]
        }

    assert clusters(exact) == clusters(capped)


def test_simhash_cap_bounded_and_verified(spark):
    n = 2_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical page body for simhash banding collapse test case").alias("text"),
    )
    pairs = simhash_pairs(df, max_bucket_size=50)
    got = pairs.agg(
        F.count("*").alias("n"),
        F.max("doc_a").alias("hub"),
        F.max("hamming").alias("ham"),
    ).collect()[0]
    assert got.n == n - 1
    assert got.hub == 0
    assert got.ham == 0  # star edges still carry the exact verify


def test_simhash_cap_equivalence_small(spark):
    df = _mixed_corpus(spark, n_groups=4, group=3, singles=6)
    exact = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(df, max_hamming=60).collect()
    }
    # a generous hamming bound makes pair sets comparable: star edges
    # only rewire WITHIN buckets, never drop bucket membership
    capped_losers = {
        r.doc_b for r in simhash_pairs(df, max_hamming=60, max_bucket_size=2).collect()
    }
    exact_losers = {b for (_, b) in exact}
    assert exact_losers == capped_losers


def test_cap_validation(spark):
    df = _mixed_corpus(spark, n_groups=1, group=2, singles=0)
    with pytest.raises(ValueError):
        minhash_lsh_pairs(df, max_bucket_size=1).collect()


def test_star_invariant_random_corpora(spark):
    """Property check over randomized duplicate structures: for ANY
    corpus and the tightest cap, star routing preserves the loser set
    ("has a smaller member in some shared bucket") and connected
    components exactly."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(4):
        rows, i = [], 0
        for g in range(rng.randint(2, 5)):
            text = " ".join(
                f"w{rng.randrange(6)}" for _ in range(rng.randint(6, 14))
            )
            for _ in range(rng.randint(1, 5)):
                # half the members get a tiny mutation: partial bucket
                # overlap, multi-bucket components
                t = text + (f" tail{i}" if rng.random() < 0.5 else "")
                rows.append((i, t))
                i += 1
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        exact = minhash_lsh_pairs(df)
        capped = minhash_lsh_pairs(df, max_bucket_size=2)

        def losers(p):
            return {
                r.doc_id
                for r in p.select(F.col("doc_b").alias("doc_id"))
                .distinct()
                .collect()
            }

        assert losers(exact) == losers(capped), f"trial {trial}"

        def comps(p):
            out = dedup_clusters(df, p)
            return {
                frozenset(g)
                for g in out.groupBy("cluster_id")
                .agg(F.collect_set("doc_id").alias("m"))
                .toPandas()["m"]
            }

        assert comps(exact) == comps(capped), f"trial {trial}"
