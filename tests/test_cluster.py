"""Connected-components / dedup-cluster tests."""

from carbon_clickhouse_spark.datapipe.cluster import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_chain_and_two_components(spark):
    # path 1-2-3-4 (diameter > 1 forces multiple star rounds) + 10-11
    e = _edges(spark, [(2, 1), (2, 3), (4, 3), (10, 11)])
    got = {r.node: r.cluster_id for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_and_reversed_edges(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (3, 3)])  # self-loop dropped
    got = {r.node: r.cluster_id for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1}


def test_long_path_converges(spark):
    # 0-1-2-...-19: worst case for naive propagation; star rounds are
    # logarithmic
    e = _edges(spark, [(i, i + 1) for i in range(19)])
    got = {r.node: r.cluster_id for r in connected_components(e).collect()}
    assert got == {i: 0 for i in range(20)}


def test_singletons_via_nodes(spark):
    e = _edges(spark, [(5, 6)])
    nodes = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(e, nodes=nodes).collect()
    }
    assert got == {5: 5, 6: 5, 7: 7}


def test_dedup_clusters(spark):
    docs = None  # unused by dedup_clusters beyond signature symmetry
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_keeper)
        for r in dedup_clusters(docs, e).collect()
    }
    assert out == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        7: (7, 2, True),
        8: (7, 2, False),
    }
