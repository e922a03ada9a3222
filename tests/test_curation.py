"""Cluster-balanced curation (datapipe/curation.py): exact integer
assignment, half-up quantization parity, deterministic balanced
sampling."""

import pytest
from pyspark.sql import functions as F, types as T

from carbon_clickhouse_spark.datapipe.curation import (
    _BUCKETS,
    assign_clusters,
    balance_rates,
    cluster_balanced_keep,
    cluster_curation,
    seed_centroids,
)


def _emb_df(spark, rows):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], schema
    )


def test_assignment_known_clusters(spark):
    # two orthogonal directions; ids 0/1 seed the centroids
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near centroid 0
        (3, [0.1, 0.9, 0.0, 0.0]),   # near centroid 1
        (4, [-1.0, 2.0, 0.0, 0.0]),  # strongly centroid 1
    ]
    df = _emb_df(spark, rows)
    cent = seed_centroids(df, 2)
    assert cent == [[1000, 0, 0, 0], [0, 1000, 0, 0]]
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(
            df, [[c / 1000 for c in v] for v in cent]
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 1}


def test_argmax_tie_breaks_to_lowest_centroid(spark):
    # equidistant from both centroids -> cluster 0 (oracle: ORDER BY
    # dot DESC, cid)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.5, 0.5]),
    ]
    df = _emb_df(spark, rows)
    cent = seed_centroids(df, 2)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(
            df, [[c / 1000 for c in v] for v in cent]
        ).collect()
    }
    assert got[2] == 0


def test_halfup_quantization_parity(spark):
    """float32 0.0625 * 1000 = 62.5 exactly: Spark/DuckDB round
    half-up to 63; np.rint would give 62.  The numpy twin must match
    the Spark expression."""
    from carbon_clickhouse_spark.datapipe.curation import _quantize_np
    from carbon_clickhouse_spark.datapipe.similarity import quantize

    import numpy as np

    vals = [0.0625, -0.0625, 0.0635, 0.1875, -0.1875, 0.2, -0.3]
    df = _emb_df(spark, [(0, vals)])
    spark_q = df.select(quantize(F.col("embedding")).alias("q")).collect()[0]["q"]
    np_q = _quantize_np(np.asarray(vals, dtype=np.float32), 1000).tolist()
    assert list(spark_q) == np_q
    assert np_q[0] == 63 and np_q[1] == -63  # the tie cases


def test_balance_rates_floor_and_cap():
    rates = balance_rates({0: 100, 1: 300, 2: 50})
    assert rates[2] == _BUCKETS          # smallest cluster keeps all
    assert rates[0] == 5000              # 50/100
    assert rates[1] == 1667              # floor(50/300*10000+0.5)
    assert balance_rates({0: 10}, target=100)[0] == _BUCKETS  # capped
    assert balance_rates({}) == {}


def test_cluster_balanced_keep_semantics(spark):
    # cluster 1 is 4x over-represented: expect ~25% kept, cluster 0 all
    rows = [(i, [1.0, 0.0]) for i in range(40)] + [
        (100 + i, [0.0, 1.0]) for i in range(10)
    ]
    df = _emb_df(spark, [(i, v) for i, v in rows])
    cent = [[0.0, 1.0], [1.0, 0.0]]  # cluster 0 = y-axis (small side)
    assigned = assign_clusters(df, cent)
    out = cluster_balanced_keep(assigned).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r["kept"])
    assert all(k == 1 for k in by_cluster[0])  # smallest: all kept
    kept_big = sum(by_cluster[1])
    assert 0 < kept_big < len(by_cluster[1])   # genuinely downsampled
    # deterministic under layout changes
    out2 = cluster_balanced_keep(
        assign_clusters(df.repartition(7), cent)
    ).collect()
    assert sorted((r["vec_id"], r["cluster"], r["kept"]) for r in out) == sorted(
        (r["vec_id"], r["cluster"], r["kept"]) for r in out2
    )


def test_float_centroid_path(spark):
    """scale=None accepts float centroids (e.g. train_ivf_centroids
    output) and assigns well-separated data identically."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
    ]
    df = _emb_df(spark, rows)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(
            df, [[1.0, 0.0], [0.0, 1.0]], scale=None
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0}


def test_cluster_curation_end_to_end(spark):
    rows = [(i, [1.0, float(i % 3) / 10]) for i in range(30)]
    df = _emb_df(spark, rows)
    out = cluster_curation(df, k=3)
    assert out.columns == ["vec_id", "cluster", "kept"]
    got = out.collect()
    assert len(got) == 30
    assert all(r["kept"] in (0, 1) for r in got)


def test_apply_cluster_balance(spark):
    """Docs losing the balance draw are dropped; docs without an
    embedding pass through untouched."""
    from carbon_clickhouse_spark.datapipe.curation import (
        apply_cluster_balance,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(25)], "doc_id long, text string"
    )
    # seeds: id 0 -> x-axis, id 1 -> y-axis; the x cluster {0, 2..20}
    # is 5x over-represented vs the y cluster {1, 21..23}; id 24 has
    # NO embedding
    x_side = {0} | set(range(2, 21))
    y_side = {1, 21, 22, 23}
    emb = _emb_df(
        spark,
        [(i, [1.0, 0.0] if i in x_side else [0.0, 1.0]) for i in range(24)],
    ).withColumnRenamed("vec_id", "doc_id")
    out = apply_cluster_balance(docs, emb, k=2, id_col="doc_id")
    got = {r["doc_id"] for r in out.collect()}
    assert 24 in got                       # un-embedded passes
    assert y_side <= got                   # smallest cluster kept whole
    assert len(got & x_side) < len(x_side)  # big cluster downsampled
    # deterministic
    got2 = {r["doc_id"] for r in apply_cluster_balance(
        docs.repartition(5), emb, k=2, id_col="doc_id"
    ).collect()}
    assert got == got2


def test_cluster_balance_cli(tmp_path, spark):
    """--prepare-corpus --cluster-balance drops over-represented
    cluster members by embedding, keeps un-embedded docs."""
    import duckdb

    from carbon_clickhouse_spark.__main__ import main

    con = duckdb.connect()
    src = str(tmp_path / "docs.parquet")
    # distinct word sets per doc: the prep chain's near-dedup must not
    # collapse the corpus before the balance stage sees it
    vals = ", ".join(
        f"({i}, 'alpha{i} beta{i} gamma{i} delta{i} epsilon{i}')"
        for i in range(12)
    )
    con.execute(
        f"COPY (SELECT * FROM (VALUES {vals}) t(doc_id, text)) "
        f"TO '{src}' (FORMAT PARQUET)"
    )
    embp = str(tmp_path / "emb.parquet")
    # seeds: doc 0 -> x-axis, doc 1 -> y-axis; x cluster {0, 2..8}
    # (8 docs) vs y cluster {1, 9} (2 docs)
    evals = ", ".join(
        f"({i}, CAST([{'0.0, 1.0' if i in (1, 9) else '1.0, 0.0'}] AS FLOAT[]))"
        for i in range(10)  # docs 10, 11 have no embedding
    )
    con.execute(
        f"COPY (SELECT * FROM (VALUES {evals}) t(doc_id, embedding)) "
        f"TO '{embp}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "out")
    rc = main([
        "--prepare-corpus", src, out,
        "--min-tokens", "2", "--shards", "1",
        "--cluster-balance", embp, "--cluster-k", "2",
        "--master", "local[2]",
    ])
    assert rc == 0
    kept = {
        r[0] for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{out}/corpus/*/*.parquet')"
        ).fetchall()
    }
    assert {10, 11} <= kept                 # un-embedded pass through
    x_side = {0, 2, 3, 4, 5, 6, 7, 8}
    assert len(kept & x_side) < len(x_side)  # big side shrank
    assert {1, 9} <= kept                    # small side kept whole


def test_kmeans_refine_moves_centroids_to_means(spark):
    """One Lloyd iteration over two well-separated blobs lands each
    centroid on its blob's exact mean."""
    from carbon_clickhouse_spark.datapipe.curation import kmeans_refine

    blob_a = [(i, [10.0 + (i % 3), 0.0]) for i in range(6)]       # mean x=11
    blob_b = [(100 + i, [0.0, 20.0 + (i % 3)]) for i in range(6)]  # mean y=21
    df = _emb_df(spark, blob_a + blob_b)
    cent = kmeans_refine(df, [[9.0, 0.0], [0.0, 19.0]], iters=1)
    assert cent[0] == pytest.approx([11.0, 0.0])
    assert cent[1] == pytest.approx([0.0, 21.0])


def test_kmeans_refine_bitwise_deterministic(spark):
    """Integer partial sums make the refined centroids bit-for-bit
    identical under any partitioning."""
    from carbon_clickhouse_spark.datapipe.curation import kmeans_refine

    rows = [
        (i, [((i * 37) % 100) / 100.0, ((i * 53) % 100) / 100.0])
        for i in range(200)
    ]
    df = _emb_df(spark, rows)
    init = [[0.1, 0.1], [0.9, 0.9], [0.1, 0.9]]
    c1 = kmeans_refine(df, init, iters=3)
    c2 = kmeans_refine(df.repartition(13), init, iters=3)
    assert c1 == c2  # exact float equality, not approx


def test_kmeans_refine_empty_cluster_keeps_centroid(spark):
    from carbon_clickhouse_spark.datapipe.curation import kmeans_refine

    df = _emb_df(spark, [(i, [1.0, 0.0]) for i in range(5)])
    # centroid 1 is far from everything and wins no points
    cent = kmeans_refine(df, [[1.0, 0.0], [-50.0, -50.0]], iters=2)
    assert cent[0] == pytest.approx([1.0, 0.0])
    assert cent[1] == [-50.0, -50.0]  # preserved verbatim


def test_cluster_curation_with_refinement(spark):
    """refine_iters composes: output schema/rows unchanged, clusters
    still deterministic under repartition."""
    rows = [(i, [float(i % 4), float((i * 7) % 5)]) for i in range(40)]
    df = _emb_df(spark, rows)
    out1 = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in cluster_curation(df, k=4, refine_iters=2).collect()
    )
    out2 = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in cluster_curation(
            df.repartition(9), k=4, refine_iters=2
        ).collect()
    )
    assert out1 == out2
    assert len(out1) == 40


def test_seed_centroids_validation(spark):
    df = _emb_df(spark, [(0, [1.0])])
    with pytest.raises(ValueError):
        seed_centroids(df, 0)
    with pytest.raises(ValueError):
        seed_centroids(df.filter("vec_id < 0"), 2)
