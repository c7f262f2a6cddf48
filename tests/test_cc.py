"""Connected-components + dense-relabel unit tests vs the union-find
oracle (SURVEY.md §2.8 C1/C2)."""

import random

import pytest

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


def test_cc_durable_rounds_resume_after_kill(spark, tmp_path, monkeypatch):
    """VERDICT r03 item 4: with a CheckpointManager, CC rounds are durable
    tables — a job killed mid-loop resumes from the committed rounds
    (reloaded, not recomputed) and produces identical labels."""
    import importlib

    # the operators package re-exports the FUNCTION under the same name,
    # shadowing the submodule attribute — resolve the module explicitly
    cc = importlib.import_module("sparkdedup.operators.connected_components")
    from sparkdedup.checkpoint import CheckpointManager

    n = 64
    edge_list = [(i, i + 1) for i in range(n - 1)]  # chain: many rounds
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")

    def labels(star):
        out = assignments_from_components(docs, star, dense=True)
        return {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    want = labels(connected_components(edges))  # memory-only reference run

    root = str(tmp_path / "cc_ckpt")
    manifest = {"test": "cc_durable", "n": n}

    # --- run 1: crash after 2 durable rounds are committed ---
    calls = {"n": 0}
    real_small_star = cc._small_star

    def crashing_small_star(e):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated executor/job loss mid-CC-loop")
        return real_small_star(e)

    monkeypatch.setattr(cc, "_small_star", crashing_small_star)
    ck1 = CheckpointManager(spark, root, manifest=manifest)
    with pytest.raises(RuntimeError, match="simulated"):
        connected_components(edges, ckpt=ck1)
    monkeypatch.undo()
    committed = ck1.list_stages()
    assert "cc_round_000" in committed and "cc_round_002" in committed

    # --- run 2: resume — committed rounds reload without re-running ---
    rebuilt = {"n": 0}

    def counting_small_star(e):
        rebuilt["n"] += 1
        return real_small_star(e)

    monkeypatch.setattr(cc, "_small_star", counting_small_star)
    ck2 = CheckpointManager(spark, root, manifest=manifest)
    star = connected_components(edges, ckpt=ck2)
    got = labels(star)
    assert got == want
    # rounds 1-2 came from tables; only the remaining rounds were built
    total_rounds = len(ck2.list_stages()) - 1  # minus cc_round_000
    assert 0 < rebuilt["n"] == total_rounds - 2

    # conf restoration survived the crash path of run 1
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_small_graph_kernel_matches_star_loop(spark):
    """Round-6 fast path: the single-task numpy kernel (default for small
    memory-mode graphs) must produce the same star edges as the
    large-star/small-star loop (forced via small_graph_max_edges=None) on
    adversarial shapes — long chain (worst diameter), random graphs,
    cliques, and the empty set."""
    random_graphs = []
    rng = random.Random(13)
    for _ in range(3):
        n = 80
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        random_graphs.append([(a, b) for a, b in es if a != b])
    shapes = [
        [(i, i + 1) for i in range(63)],                       # chain
        [(0, i) for i in range(1, 9)],                         # star
        [(a, b) for a in range(5) for b in range(a + 1, 5)],   # clique
        [],                                                    # empty
        *random_graphs,
    ]
    for edge_list in shapes:
        edges = spark.createDataFrame(
            [(a, b) for a, b in edge_list] or [(0, 0)], "src long, dst long"
        )
        if not edge_list:
            edges = edges.limit(0)
        fast = connected_components(edges)
        loop = connected_components(edges, small_graph_max_edges=None)
        to_set = lambda df: {(r["doc_id"], r["root"]) for r in df.collect()}
        assert to_set(fast) == to_set(loop), edge_list[:5]


def test_cc_durable_labels_match_memory_mode(spark, tmp_path):
    """Durable-rounds mode is a physical choice only: labels must be
    identical to the localCheckpoint mode on a mixed graph."""
    from sparkdedup.checkpoint import CheckpointManager

    random_edges = [(3, 7), (7, 11), (0, 19), (5, 6), (12, 13), (13, 14), (14, 12)]
    edges = spark.createDataFrame(random_edges, "src long, dst long")
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")

    def labels(star):
        out = assignments_from_components(docs, star, dense=True)
        return {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    ck = CheckpointManager(spark, str(tmp_path / "ck"), manifest={"m": 1})
    assert labels(connected_components(edges, ckpt=ck)) == labels(
        connected_components(edges)
    )
