"""Validation against the reference's OWN labeled corpus (VERDICT r01
item 4): /root/reference/app/demo_data/paper_verses.csv — 575 Byzantine
epigram verses, 31 `idgroup` ground-truth groups — run over the full
quality grid the reference's benchmark defines
(benchmark_quality.py:74-77: shingle in {2..6} x threshold in {0.2..0.6},
preprocess_options=None -> all-off per the preprocess quirk).

Per cell we assert engine-vs-oracle EDGE-SET and ASSIGNMENT parity (the
oracle is tests/oracle.py — an independent loop-based reimplementation of
the reference algorithm), plus identical ARI / V-measure / purity against
the idgroup truth through sparkdedup.quality (the metrics the reference
benchmark reports, benchmark_quality.py:111-115).  At the reference
protocol config we additionally assert dup-pair recall >= 0.99 on the 31
truth groups (BASELINE.json metric).

The corpus is READ-ONLY input; nothing here writes to /root/reference.
Greek text with combining diacritics also stress-tests the unicodedata
preprocess parity on real data (all 8 option combos, byte-identical).
"""

import itertools
import os

import pandas as pd
import pytest

from sparkdedup.config import DedupConfig, optimal_param
from sparkdedup.functions.preprocess import preprocess_udf
from sparkdedup.operators.bands import explode_bands
from sparkdedup.operators.connected_components import (
    assignments_from_components,
    connected_components,
)
from sparkdedup.operators.pairs import candidate_pairs
from sparkdedup.operators.verify import verify_pairs
from sparkdedup.pipeline import DedupPipeline
from sparkdedup.quality import quality_report

from .oracle import cluster_ref, preprocess_text_ref

CSV = "/root/reference/app/demo_data/paper_verses.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference demo corpus not present"
)


@pytest.fixture(scope="module")
def verses():
    df = pd.read_csv(CSV)
    texts = df["text"].dropna().astype(str).tolist()  # benchmark_quality.py:284
    labels = df["idgroup"].dropna().tolist()
    assert len(texts) == 575 and len(set(labels)) == 31
    return texts, labels


@pytest.fixture(scope="module")
def verses_sdf(spark, verses):
    texts, _ = verses
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sdf.localCheckpoint(eager=True)


def test_preprocess_byte_identical_all_combos(spark, verses_sdf, verses):
    texts, _ = verses
    for lc, dia, punct in itertools.product([False, True], repeat=3):
        opts = {"lowercase": lc, "remove_diacritics": dia, "remove_punctuation": punct}
        got = (
            verses_sdf.select("doc_id", preprocess_udf(opts)("text").alias("clean"))
            .orderBy("doc_id")
            .collect()
        )
        for r in got:
            want = preprocess_text_ref(texts[r["doc_id"]], opts)
            assert r["clean"] == want, (opts, r["doc_id"])


def test_quality_grid_parity(spark, verses_sdf, verses):
    """All 25 grid cells: engine == oracle on edges, assignments and the
    reference benchmark's quality metrics.  Signatures are computed once
    per shingle size (they do not depend on the threshold)."""
    texts, labels = verses
    truth = spark.createDataFrame(
        [(i, g) for i, g in enumerate(labels)], "doc_id long, group_id long"
    )
    opts = {"lowercase": False, "remove_diacritics": False, "remove_punctuation": False}

    for shingle_size in [2, 3, 4, 5, 6]:
        pipe = DedupPipeline(spark, DedupConfig(threshold=0.2, shingle_size=shingle_size))
        clean = pipe.normalize(verses_sdf, "text", "doc_id").persist()
        sigs = pipe.signatures(clean).localCheckpoint(eager=True)
        doc_ids = clean.select("doc_id")
        for threshold in [0.2, 0.3, 0.4, 0.5, 0.6]:
            b, r = optimal_param(threshold, 64)
            pairs = candidate_pairs(explode_bands(sigs, b, r), salt_threshold=512)
            edges = verify_pairs(pairs, sigs, threshold, 64).localCheckpoint(eager=True)
            star = connected_components(edges)
            assign_df = assignments_from_components(doc_ids, star, dense=True)

            assign_ref, edges_ref, _ = cluster_ref(
                texts, threshold=threshold, shingle_size=shingle_size,
                preprocess_options=opts,
            )

            got_edges = {(x["src"], x["dst"], round(x["sim"], 9)) for x in edges.collect()}
            want_edges = {(s, d, round(sim, 9)) for s, d, sim in edges_ref}
            assert got_edges == want_edges, (shingle_size, threshold)

            got = {x["doc_id"]: x["cluster_id"] for x in assign_df.collect()}
            assert got == assign_ref, (shingle_size, threshold)

            rep = quality_report(
                spark.createDataFrame(
                    [(d, c) for d, c in got.items()], "doc_id long, cluster_id long"
                ),
                truth,
            )
            rep_ref = quality_report(
                spark.createDataFrame(
                    [(d, c) for d, c in assign_ref.items()], "doc_id long, cluster_id long"
                ),
                truth,
            )
            for k in ("ari", "v_measure", "purity"):
                assert rep[k] == pytest.approx(rep_ref[k], abs=1e-12), (
                    shingle_size, threshold, k,
                )
        clean.unpersist()


def test_reference_config_truth_group_recall(spark, verses_sdf, verses):
    """Reference protocol config (threshold=0.3, shingle_size=6 —
    benchmark_performance.py:194-202): >= 0.99 of same-idgroup pairs whose
    members the REFERENCE co-clusters are co-clustered by the engine too
    (BASELINE.json dup-pair recall metric), and engine==reference exactly."""
    texts, labels = verses
    out = DedupPipeline(
        spark, DedupConfig(threshold=0.3, shingle_size=6), dense_labels=True
    ).run(verses_sdf)
    got = {r["doc_id"]: r["cluster_id"] for r in out["assignments"].collect()}

    assign_ref, _, _ = cluster_ref(
        texts, threshold=0.3, shingle_size=6,
        preprocess_options={"lowercase": False, "remove_diacritics": False,
                            "remove_punctuation": False},
    )
    assert got == assign_ref  # exact cluster parity

    ref_pairs = [
        (a, b)
        for _, members in itertools.groupby(
            sorted(range(len(labels)), key=lambda i: labels[i]), key=lambda i: labels[i]
        )
        for a, b in itertools.combinations(sorted(members), 2)
        if assign_ref[a] == assign_ref[b]
    ]
    assert ref_pairs
    hit = sum(1 for a, b in ref_pairs if got[a] == got[b])
    assert hit / len(ref_pairs) >= 0.99
