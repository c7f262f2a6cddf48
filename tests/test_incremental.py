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

    # edge sets identical too — and append-only state must hold NO
    # duplicate pair rows (the O(delta) design never rewrites old edges)
    want_edges = {(r["src"], r["dst"]) for r in full["edges"].collect()}
    all_edge_rows = [(r["src"], r["dst"]) for r in inc.edges.collect()]
    assert len(all_edge_rows) == len(set(all_edge_rows))
    assert set(all_edge_rows) == want_edges


def test_incremental_state_dir_survives_instances(spark, tmp_path):
    """state_dir mode: deltas append to parquet; a NEW IncrementalDedup
    over the same dir continues the run and still equals the global
    batch result."""
    n = 180
    sdf = webtext_spark_df(spark, n, seed=42).localCheckpoint(eager=True)
    cfg = DedupConfig(threshold=0.3, shingle_size=6)
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in DedupPipeline(spark, cfg).run(sdf)["assignments"].collect()
    }

    sd = str(tmp_path / "state")
    inc1 = IncrementalDedup(spark, cfg, state_dir=sd)
    inc1.ingest_batch(sdf.where("doc_id < 60"))
    inc1.ingest_batch(sdf.where("doc_id >= 60 and doc_id < 120"))

    inc2 = IncrementalDedup(spark, cfg, state_dir=sd)  # fresh instance
    assign = inc2.ingest_batch(sdf.where("doc_id >= 120"))
    got = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}

    # min-doc-id labels on identical partitions
    def canon(d):
        clusters = {}
        for doc, c in d.items():
            clusters.setdefault(c, set()).add(doc)
        return {frozenset(v) for v in clusters.values()}

    assert canon(got) == canon(want)


def test_exactly_once_commit_log(spark, tmp_path):
    """Replay protection + torn-write invisibility: a re-delivered batch
    (same batch_id) must not change the committed state, and delta dirs
    without a commit marker (a crash before commit) are never read."""
    import os

    docs = webtext_spark_df(spark, 120, seed=3).select("doc_id", "text")
    cfg = DedupConfig(threshold=0.3, shingle_size=4)
    sd = str(tmp_path / "state")
    inc = IncrementalDedup(spark, cfg, state_dir=sd)
    b0 = docs.where("doc_id < 60")
    b1 = docs.where("doc_id >= 60")

    a1 = inc.ingest_batch(b0, batch_id=0)
    sig_n = inc.signatures.count()
    edge_n = inc.edges.count() if inc.edges is not None else 0
    a1_rows = {(r["doc_id"], r["cluster_id"]) for r in a1.collect()}

    # replayed delivery of the SAME batch id: a no-op on state
    a2 = inc.ingest_batch(b0, batch_id=0)
    assert inc.signatures.count() == sig_n
    assert (inc.edges.count() if inc.edges is not None else 0) == edge_n
    assert {(r["doc_id"], r["cluster_id"]) for r in a2.collect()} == a1_rows

    # torn write: a delta dir with no commit marker is invisible
    os.makedirs(os.path.join(sd, "signatures", "delta=b99"), exist_ok=True)
    inc2 = IncrementalDedup(spark, cfg, state_dir=sd)  # fresh instance
    assert inc2.signatures.count() == sig_n

    # fresh instance folds the next batch exactly once despite a replay
    inc2.ingest_batch(b1, batch_id=1)
    got = inc2.ingest_batch(b1, batch_id=1)  # replayed delivery
    assert inc2.signatures.count() == 120

    want = {
        r["doc_id"]: r["cluster_id"]
        for r in DedupPipeline(spark, cfg)
        .run(docs)["assignments"]
        .select("doc_id", "cluster_id")
        .collect()
    }
    got_map = {r["doc_id"]: r["cluster_id"] for r in got.collect()}
    assert got_map == want


def test_overlapping_batches_first_write_wins(spark):
    """A doc_id delivered in two different batches must appear exactly
    once in state and exactly once in the returned assignments (the
    dedupe_ids anti-join guard)."""
    docs = webtext_spark_df(spark, 120, seed=3).select("doc_id", "text")
    cfg = DedupConfig(threshold=0.3, shingle_size=4)
    inc = IncrementalDedup(spark, cfg)
    inc.ingest_batch(docs.where("doc_id < 80"))
    assign = inc.ingest_batch(docs.where("doc_id >= 40"))  # 40..79 overlap
    assert inc.signatures.count() == 120
    rows = assign.collect()
    assert len(rows) == 120
    assert len({r["doc_id"] for r in rows}) == 120

    want = {
        r["doc_id"]: r["cluster_id"]
        for r in DedupPipeline(spark, cfg)
        .run(docs)["assignments"]
        .select("doc_id", "cluster_id")
        .collect()
    }
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == want
