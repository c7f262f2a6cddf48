"""Clustering-quality metrics mirroring the reference's quality benchmark
(benchmark_quality.py:25-69,111-115): purity, mean group/cluster purity,
over-clustering ratio, plus ARI and V-measure (sklearn is not in the
sandbox, so both are implemented from their published formulas in numpy).

Aggregation strategy at scale: the metrics depend only on the
(true_label, cluster_id) CONTINGENCY TABLE, which is a tiny groupBy-count
result — so the Spark side is one aggregation and the math runs
driver-side on the contingency counts (SURVEY.md §2.5 A9).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


MAX_CONTINGENCY_CELLS = 1_000_000


def contingency(assign: DataFrame, truth: DataFrame, key: str = "doc_id") -> np.ndarray:
    """(doc_id, cluster_id) x (doc_id, group_id) -> dense contingency
    matrix of counts (rows = true groups, cols = predicted clusters).

    Driver-side by design (SURVEY §2.5 A9): the metrics need only the
    contingency TABLE, which for a labeled evaluation corpus is tiny.  The
    cell-count guard (VERDICT r04 item 2) fails loudly if someone points
    this diagnostic at a full corpus where true-group x cluster cardinality
    explodes — that collect would OOM the driver, and at that scale these
    exact metrics need a sampled or sketched estimator, not this path."""
    joined = assign.join(truth, key).groupBy("group_id", "cluster_id").count()
    # persist across the guard count + collect: without it the join +
    # aggregation recomputed twice per call (ADVICE r05)
    joined = joined.persist()
    try:
        n_cells = joined.count()
        if n_cells > MAX_CONTINGENCY_CELLS:
            raise ValueError(
                f"contingency table has {n_cells} nonzero cells "
                f"(> {MAX_CONTINGENCY_CELLS}): quality metrics are a driver-side "
                "diagnostic for labeled evaluation corpora — run them on a "
                "sample, not the full corpus"
            )
        rows = joined.collect()
    finally:
        joined.unpersist()
    gids = sorted({r["group_id"] for r in rows})
    cids = sorted({r["cluster_id"] for r in rows})
    gi = {g: i for i, g in enumerate(gids)}
    ci = {c: i for i, c in enumerate(cids)}
    m = np.zeros((len(gids), len(cids)), dtype=np.int64)
    for r in rows:
        m[gi[r["group_id"]], ci[r["cluster_id"]]] = r["count"]
    return m


def adjusted_rand_index(m: np.ndarray) -> float:
    """Hubert & Arabie ARI from the contingency table."""
    n = m.sum()
    if n <= 1:
        return 1.0
    comb = lambda x: x * (x - 1) / 2.0
    sum_ij = comb(m.astype(np.float64)).sum()
    a = comb(m.sum(axis=1).astype(np.float64)).sum()
    b = comb(m.sum(axis=0).astype(np.float64)).sum()
    expected = a * b / comb(float(n))
    max_index = (a + b) / 2.0
    if max_index == expected:
        return 1.0
    return float((sum_ij - expected) / (max_index - expected))


def v_measure(m: np.ndarray, beta: float = 1.0) -> float:
    """Rosenberg & Hirschberg V-measure from the contingency table."""
    n = m.sum()
    if n == 0:
        return 1.0
    p = m / n
    pg = p.sum(axis=1)
    pc = p.sum(axis=0)

    def entropy(v):
        v = v[v > 0]
        return float(-(v * np.log(v)).sum())

    h_g, h_c = entropy(pg), entropy(pc)
    # H(G|C), H(C|G)
    h_g_c = 0.0
    h_c_g = 0.0
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            if p[i, j] > 0:
                h_g_c -= p[i, j] * math.log(p[i, j] / pc[j])
                h_c_g -= p[i, j] * math.log(p[i, j] / pg[i])
    hom = 1.0 if h_g == 0 else 1.0 - h_g_c / h_g
    comp = 1.0 if h_c == 0 else 1.0 - h_c_g / h_c
    if hom + comp == 0:
        return 0.0
    return float((1 + beta) * hom * comp / (beta * hom + comp))


def purity(m: np.ndarray) -> float:
    """benchmark_quality.py:25-38: per predicted cluster, count the
    majority true label; ratio of majority mass over n."""
    n = m.sum()
    return float(m.max(axis=0).sum() / n) if n else 1.0


def cluster_purities(m: np.ndarray) -> dict:
    """benchmark_quality.py:41-69 metric family."""
    group_purity = m.max(axis=1) / m.sum(axis=1)
    cluster_purity = m.max(axis=0) / m.sum(axis=0)
    return {
        "mean_group_purity": float(group_purity.mean()),
        "mean_cluster_purity": float(cluster_purity.mean()),
        "over_clustering_ratio": m.shape[1] / m.shape[0],
        "num_pred_clusters": int(m.shape[1]),
        "num_true_groups": int(m.shape[0]),
        "perfect_group_purity_pct": float((group_purity == 1.0).mean()),
        "perfect_cluster_purity_pct": float((cluster_purity == 1.0).mean()),
    }


def quality_report(assign: DataFrame, truth: DataFrame) -> dict:
    m = contingency(assign, truth)
    out = {
        "ari": adjusted_rand_index(m),
        "v_measure": v_measure(m),
        "purity": purity(m),
    }
    out.update(cluster_purities(m))
    return out
