"""Quality-grid protocol (SURVEY.md §5 / FIXTURES.md §4): pipeline metrics
on the labeled fixture must equal the oracle's metrics cell-by-cell, and
the ARI/V-measure implementations must match their published formulas on
hand-checked cases."""

import numpy as np
import pytest

from sparkdedup.config import DedupConfig
from sparkdedup.io.webtext import generate_webtext, webtext_spark_df
from sparkdedup.pipeline import DedupPipeline
from sparkdedup.quality import (
    adjusted_rand_index,
    purity,
    quality_report,
    v_measure,
)

from .oracle import cluster_ref


def test_ari_known_values():
    # perfect agreement
    m = np.array([[5, 0], [0, 5]])
    assert adjusted_rand_index(m) == pytest.approx(1.0)
    # label permutation still perfect
    m = np.array([[0, 5], [5, 0]])
    assert adjusted_rand_index(m) == pytest.approx(1.0)
    # one cluster holding everything ~ chance
    m = np.array([[5], [5]])
    assert adjusted_rand_index(m) == pytest.approx(0.0, abs=1e-9)


def test_v_measure_known_values():
    m = np.array([[5, 0], [0, 5]])
    assert v_measure(m) == pytest.approx(1.0)
    m = np.array([[5], [5]])
    assert v_measure(m) == pytest.approx(0.0, abs=1e-9)
    # splitting one true group into two pure clusters: homogeneity 1,
    # completeness < 1
    m = np.array([[3, 3, 0], [0, 0, 6]])
    assert 0.0 < v_measure(m) < 1.0


def test_purity_majority():
    m = np.array([[4, 1], [1, 4]])
    assert purity(m) == pytest.approx(0.8)


@pytest.mark.parametrize("shingle_size,threshold", [(4, 0.3), (6, 0.5)])
def test_grid_cell_matches_oracle(spark, shingle_size, threshold):
    n = 300
    pdf = generate_webtext(n, seed=42)
    sdf = webtext_spark_df(spark, n, seed=42)
    truth = spark.createDataFrame(
        pdf.reset_index()[["index", "group_id"]].rename(columns={"index": "doc_id"})
    )

    cfg = DedupConfig(threshold=threshold, shingle_size=shingle_size)
    out = DedupPipeline(spark, cfg).run(sdf)
    rep = quality_report(out["assignments"].select("doc_id", "cluster_id"), truth)

    # oracle pipeline -> same metrics through the same formulas
    assign_ref, _, _ = cluster_ref(
        pdf["text"].tolist(),
        threshold=threshold,
        shingle_size=shingle_size,
        preprocess_options=cfg.preprocess_options(),
    )
    ref_assign_df = spark.createDataFrame(
        [(d, c) for d, c in assign_ref.items()], "doc_id long, cluster_id long"
    )
    rep_ref = quality_report(ref_assign_df, truth)
    for k in ("ari", "v_measure", "purity", "mean_group_purity", "over_clustering_ratio"):
        assert rep[k] == pytest.approx(rep_ref[k], abs=1e-12), k

    # sanity: near-dup fixture at reasonable config clusters decently
    assert rep["ari"] > 0.5


def test_contingency_cell_guard(spark, monkeypatch):
    """VERDICT r04 item 3: the driver-side contingency collect must fail
    loudly when pointed at a corpus-scale label set instead of OOMing the
    driver."""
    import sparkdedup.quality as q

    assign = spark.createDataFrame([(i, i) for i in range(10)], "doc_id long, cluster_id long")
    truth = spark.createDataFrame([(i, i % 3) for i in range(10)], "doc_id long, group_id long")
    monkeypatch.setattr(q, "MAX_CONTINGENCY_CELLS", 5)
    with pytest.raises(ValueError, match="nonzero cells"):
        q.contingency(assign, truth)
    monkeypatch.setattr(q, "MAX_CONTINGENCY_CELLS", 1_000_000)
    assert q.contingency(assign, truth).sum() == 10
