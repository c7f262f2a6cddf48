"""ANN index tests: exactness when the probe set covers the whole space,
multi-probe recall monotonicity, and score correctness of every returned
neighbor against the brute-force baseline."""

import numpy as np
import pytest

from sparkdedup.ann import brute_force_topk, build_index, search

DIM = 64
N = 400


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    # clustered vectors so top-k is meaningful: 20 centers + noise
    centers = rng.randn(20, DIM).astype(np.float32)
    rows = []
    for i in range(N):
        c = centers[i % 20]
        v = (c + 0.3 * rng.randn(DIM)).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def queries(vectors):
    from pyspark.sql import functions as F

    return vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _res(df):
    return {(r["query_id"], r["rank"]): (r["vec_id"], r["cos"]) for r in df.collect()}


def test_full_probe_equals_brute_force(spark, vectors, queries):
    """n_bits=1, probes=1 probes BOTH buckets = the whole corpus ->
    search must equal the exact brute-force top-k bit for bit."""
    idx = build_index(vectors, n_bits=1, dim_stride=1)
    got = _res(search(idx, queries, k=10, n_bits=1, dim_stride=1, probes=1, dim=DIM))
    want = _res(brute_force_topk(vectors, queries, k=10, dim=DIM))
    assert got == want


def test_multiprobe_recall_curve(spark, vectors, queries):
    """recall@10 vs brute force must be monotone in the probe level, and
    probing ALL buckets (probes = n_bits) must equal brute force exactly
    — the measured curve is the docstring'd recall/probe tradeoff."""
    idx = build_index(vectors, n_bits=4, dim_stride=16, dim=DIM)
    exact = brute_force_topk(vectors, queries, k=10, dim=DIM)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(probes):
        got = {}
        res = search(idx, queries, k=10, n_bits=4, dim_stride=16, probes=probes, dim=DIM)
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return hits / total

    r0, r1, r2, r_full = recall(0), recall(1), recall(2), recall(4)
    print(f"ANN recall@10 curve (n_bits=4): probes 0={r0:.3f} 1={r1:.3f} 2={r2:.3f} 4={r_full:.3f}")
    assert r0 <= r1 <= r2 <= r_full
    assert r1 >= 0.5  # multi-probe over 5/16 buckets of clustered data
    assert r_full == 1.0  # all 16 buckets probed == exhaustive


def test_dim_validation_raises(spark, vectors, queries):
    """(n_bits-1)*dim_stride >= dim would silently zero bucket bits
    (NULL > 0 is false) — the library must refuse instead."""
    with pytest.raises(ValueError, match="index past the embedding"):
        build_index(vectors, n_bits=8, dim_stride=16, dim=DIM)
    idx = build_index(vectors, n_bits=4, dim_stride=16, dim=DIM)
    with pytest.raises(ValueError, match="index past the embedding"):
        search(idx, queries, k=5, n_bits=5, dim_stride=16, probes=1, dim=DIM)


def test_returned_scores_are_exact(spark, vectors, queries):
    """Every (query, neighbor) pair the index returns carries the same
    cosine the brute-force path computes — approximation affects WHICH
    pairs are scored, never their values."""
    idx = build_index(vectors, n_bits=4, dim_stride=16)
    res = search(idx, queries, k=10, n_bits=4, dim_stride=16, probes=1, dim=DIM)
    exact_all = brute_force_topk(vectors, queries, k=N, dim=DIM)
    truth = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact_all.collect()}
    rows = res.collect()
    assert rows
    for r in rows:
        assert truth[(r["query_id"], r["vec_id"])] == r["cos"]


def test_mask_join_path_equals_literal_path(spark, vectors, queries, monkeypatch):
    """VERDICT r03 item 6: the broadcast mask-join probe strategy (large
    probe sets) must return exactly what the inlined-literal strategy
    returns — same semantics, different physical plan."""
    import sparkdedup.ann as ann

    idx = build_index(vectors, n_bits=4, dim_stride=16, dim=DIM)
    want = _res(search(idx, queries, k=10, n_bits=4, dim_stride=16, probes=2, dim=DIM))
    monkeypatch.setattr(ann, "_PROBE_LITERAL_MAX", 0)  # force the DF path
    got = _res(search(idx, queries, k=10, n_bits=4, dim_stride=16, probes=2, dim=DIM))
    assert got == want


def test_wide_bucket_config_runs(spark, vectors, queries):
    """n_bits=32 / probes=3 (5,489 probe buckets) must RUN via the
    mask-join path instead of stalling the planner with ~5.5k literal
    expression columns (VERDICT r03: plan-size hazard)."""
    from sparkdedup.ann import _probe_masks

    assert len(_probe_masks(32, 3)) == 1 + 32 + 496 + 4960
    idx = build_index(vectors, n_bits=32, dim_stride=2, dim=DIM)
    out = search(idx, queries, k=5, n_bits=32, dim_stride=2, probes=3, dim=DIM)
    rows = out.collect()
    # sanity only: buckets are near-unique at n_bits=32, so few neighbors
    # are reachable — the guarantee under test is "plans and runs"
    assert all(r["rank"] <= 5 for r in rows)


def test_probe_mask_cap_raises(spark, vectors, queries, monkeypatch):
    import sparkdedup.ann as ann

    monkeypatch.setattr(ann, "_PROBE_MASK_MAX", 10)
    idx = build_index(vectors, n_bits=4, dim_stride=16, dim=DIM)
    with pytest.raises(ValueError, match="no longer an approximate search"):
        search(idx, queries, k=5, n_bits=4, dim_stride=16, probes=4, dim=DIM)
