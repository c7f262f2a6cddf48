"""Connected-components + dense-relabel unit tests vs the union-find
oracle (SURVEY.md §2.8 C1/C2)."""

import random

from sparkdedup.operators.connected_components import (
    assignments_from_components,
    connected_components,
)

from .oracle import UnionFindRef


def _spark_cc(spark, n, edge_list):
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_list] or [(0, 0)], "src long, dst long"
    )
    if not edge_list:
        edges = edges.limit(0)
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    star = connected_components(edges)
    out = assignments_from_components(docs, star, dense=True)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def _ref_cc(n, edge_list):
    uf = UnionFindRef(n)
    for a, b in edge_list:
        uf.union(a, b)
    return uf.assignments()


def test_chain_graph(spark):
    # worst-case diameter: a long path
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    assert _spark_cc(spark, n, edges) == _ref_cc(n, edges)


def test_no_edges_all_singletons(spark):
    assert _spark_cc(spark, 10, []) == {i: i for i in range(10)}


def test_mixed_components_dense_ids(spark):
    n = 20
    edges = [(3, 7), (7, 11), (0, 19), (5, 6), (6, 5), (12, 13)]
    got = _spark_cc(spark, n, edges)
    ref = _ref_cc(n, edges)
    assert got == ref
    # dense first-seen semantics: doc 0's cluster is 0
    assert got[0] == 0 and got[19] == 0


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_cc(spark, n, edges) == _ref_cc(n, edges), trial


def test_star_and_clique(spark):
    n = 12
    edges = [(0, i) for i in range(1, 6)] + [
        (a, b) for a in range(6, 10) for b in range(a + 1, 10)
    ]
    assert _spark_cc(spark, n, edges) == _ref_cc(n, edges)
