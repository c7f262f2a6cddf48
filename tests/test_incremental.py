"""Incremental ingest must equal one global batch run (the reference's
multi-batch mode produces the same clusters as single-batch given the
same uncapped edge set — SURVEY.md §2.4 L3 note)."""

from sparkdedup.config import DedupConfig
from sparkdedup.incremental import IncrementalDedup
from sparkdedup.io.webtext import webtext_spark_df
from sparkdedup.pipeline import DedupPipeline


def test_incremental_matches_global(spark):
    n = 240
    sdf = webtext_spark_df(spark, n, seed=42).localCheckpoint(eager=True)
    cfg = DedupConfig(threshold=0.3, shingle_size=6)

    full = DedupPipeline(spark, cfg).run(sdf)
    want = {r["doc_id"]: r["cluster_id"] for r in full["assignments"].collect()}

    inc = IncrementalDedup(spark, cfg)
    b1 = sdf.where("doc_id < 80")
    b2 = sdf.where("doc_id >= 80 and doc_id < 160")
    b3 = sdf.where("doc_id >= 160")
    inc.ingest_batch(b1)
    inc.ingest_batch(b2)
    assign = inc.ingest_batch(b3)
    got = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}

    assert got == want

    # edge sets identical too
    want_edges = {(r["src"], r["dst"]) for r in full["edges"].collect()}
    got_edges = {(r["src"], r["dst"]) for r in inc.edges.collect()}
    assert got_edges == want_edges
