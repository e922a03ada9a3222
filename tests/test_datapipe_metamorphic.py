"""Datapipe metamorphic invariants (r12): guarantees the dedup /
similarity / chunking definitions imply for ANY corpus, checked over
a seeded random one — the input-independent sibling of the oracle
gates (which pin one fixture).

- byte-identical documents MUST surface from every near-dup path:
  identical texts share every MinHash band and every SimHash band
  (hamming 0), so missing such a pair is a bucketing/join bug, not a
  recall trade-off;
- connected components must place both endpoints of every edge in
  one cluster with the smallest id as keeper;
- an embedding duplicated under a new id must come back as its
  twin's rank-1 neighbor at cosine ~ 1;
- sliding-window chunks must reconstruct the exact token stream
  (drop each later chunk's leading overlap)."""

import random

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    simhash_pairs,
)


def _random_docs(n=60, dup_every=7, seed=3):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(120)]
    docs = []
    for i in range(n):
        text = " ".join(rng.choice(words) for _ in range(40))
        docs.append((i, text))
    # exact duplicates under new ids
    dups = [(1000 + i, docs[i][1]) for i in range(0, n, dup_every)]
    return docs + dups


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _random_docs(), "doc_id long, text string"
    ).cache()


def _expected_pairs(corpus):
    groups = exact_duplicates(corpus, min_group=2).collect()
    pairs = set()
    for g in groups:
        ids = sorted(g.doc_ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    assert pairs, "fixture must contain exact duplicates"
    return pairs


def test_exact_dups_surface_from_minhash(corpus):
    want = _expected_pairs(corpus)
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus).collect()
    }
    missing = want - got
    assert not missing, missing


def test_exact_dups_surface_from_simhash(corpus):
    want = _expected_pairs(corpus)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(corpus).collect()
    }
    missing = want - got
    assert not missing, missing


def test_clusters_cover_every_edge(corpus):
    from carbon_clickhouse_spark.datapipe.cluster import dedup_clusters

    edges = minhash_lsh_pairs(corpus)
    out = dedup_clusters(corpus, edges).collect()
    cluster = {r.doc_id: r.cluster_id for r in out}
    keepers = {r.doc_id for r in out if r.is_keeper}
    for r in edges.collect():
        assert cluster[r.doc_a] == cluster[r.doc_b], (r.doc_a, r.doc_b)
    # keeper = smallest id of its cluster
    by_cluster = {}
    for d, c in cluster.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert min(members) in keepers, c


def test_duplicate_embedding_is_rank_one_neighbor(spark):
    from carbon_clickhouse_spark.datapipe.similarity import (
        brute_force_topk,
    )

    rng = random.Random(17)
    vecs = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(16)])
        for i in range(40)
    ]
    # id 900 duplicates id 5's embedding exactly
    vecs.append((900, list(vecs[5][1])))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = brute_force_topk(df, df.filter(F.col("vec_id") == 900), k=3)
    top = out.filter(F.col("rank") == 1).collect()[0]
    assert top.neighbor_id == 5
    assert top.cosine == pytest.approx(1.0, abs=1e-9)


def test_chunks_reconstruct_token_stream(spark):
    from carbon_clickhouse_spark.datapipe.pack import chunk_documents

    rng = random.Random(23)
    docs = []
    for i, n in enumerate([1, 5, 64, 65, 100, 129, 200]):
        docs.append((i, " ".join(f"t{rng.randint(0, 9)}" for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk
    for doc_id, text in docs:
        chunks = [by_doc[doc_id][i] for i in range(len(by_doc[doc_id]))]
        rebuilt = chunks[0].split()
        for c in chunks[1:]:
            rebuilt += c.split()[16:]
        assert rebuilt == text.split(), doc_id


def test_pack_token_ids_conserves_the_stream(spark):
    """Packing is concat-and-cut: the concatenation of each shard's
    packed sequences (keep_partial=True) must equal the shard's
    documents' token streams in order, each terminated by eos — no
    token lost, duplicated, or reordered, under any input
    partitioning."""
    from carbon_clickhouse_spark.datapipe.pack import pack_token_ids

    rng = random.Random(31)
    docs = []
    for i in range(25):
        n = rng.randint(0, 40)
        docs.append(
            ("s%d" % (i % 2), i, [rng.randint(5, 999) for _ in range(n)])
        )
    df = spark.createDataFrame(
        docs, "source string, doc_id long, bpe_ids array<int>"
    ).repartition(7)
    out = pack_token_ids(
        df, seq_len=16, eos_id=0, keep_partial=True
    ).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.shard, r.seq_id)):
        got.setdefault(r.shard, []).extend(r.token_ids)
    for shard in ("s0", "s1"):
        want = []
        for s, d, ids in sorted(docs):
            if s == shard:
                want.extend(ids + [0])
        # the final partial sequence may be padless-short; compare
        # the emitted prefix
        assert got[shard][: len(want)] == want, shard
        assert len(got[shard]) >= len(want) - 15


def test_deterministic_shuffle_is_a_stable_permutation(spark):
    """deterministic_shuffle must emit a PERMUTATION (exact multiset
    of rows) whose order is identical across re-runs and input
    partitionings, and a different seed must give a different
    order."""
    from carbon_clickhouse_spark.datapipe.pack import (
        deterministic_shuffle,
    )

    rows = [(i, f"d{i}") for i in range(300)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    df2 = df1.repartition(13)

    def order(df, seed):
        out = deterministic_shuffle(df, seed=seed, n_shards=8)
        return [
            r.doc_id
            for r in out.orderBy("shard", "order_key", "doc_id").collect()
        ]

    o1, o2 = order(df1, 3), order(df2, 3)
    assert o1 == o2  # partitioning-independent
    assert sorted(o1) == [i for i, _ in rows]  # permutation
    assert order(df1, 4) != o1  # a new epoch reshuffles


def test_stratified_sample_is_monotone_and_stable(spark):
    """A higher rate must keep a SUPERSET of a lower rate's rows
    (hash thresholding is monotone), rate 100 keeps everything, and
    the selection is partitioning-independent."""
    from carbon_clickhouse_spark.datapipe.pack import stratified_sample

    rows = [(i,) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long")
    keep = {}
    for rate in (10, 50, 100):
        keep[rate] = {
            r.doc_id
            for r in stratified_sample(df, F.lit(rate)).collect()
        }
    assert keep[10] <= keep[50] <= keep[100]
    assert keep[100] == {i for i, in rows}
    rep = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(11), F.lit(50)
        ).collect()
    }
    assert rep == keep[50]
    # the 10% slice should be loosely near 10% (hash uniformity)
    assert 20 <= len(keep[10]) <= 80
