"""Structured Streaming ingest: a file-source stream folded through
IncrementalDedup must produce exactly the clustering of one global batch
run over the same documents (SURVEY.md §2.10)."""

import os

import pytest
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.incremental import IncrementalDedup
from sparkdedup.io.webtext import webtext_spark_df
from sparkdedup.pipeline import DedupPipeline
from sparkdedup.streaming import stream_ingest

SCHEMA = "doc_id long, text string"


@pytest.fixture()
def stream_dirs(spark, tmp_path):
    """Three parquet files (one per micro-batch) + the expected global run
    input."""
    docs = webtext_spark_df(spark, 240, seed=42).select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, (lo, hi) in enumerate([(0, 80), (80, 160), (160, 240)]):
        (
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"stage{i}"))
        )
        # move the part file in as one atomic arrival
        stage = str(tmp_path / f"stage{i}")
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir, str(tmp_path / "stream_ckpt"), docs


def test_stream_matches_global_run(spark, stream_dirs):
    in_dir, ckpt, docs = stream_dirs
    cfg = DedupConfig(threshold=0.3, shingle_size=4)
    inc = IncrementalDedup(spark, cfg)
    q = stream_ingest(
        spark, in_dir, SCHEMA, inc, ckpt, max_files_per_trigger=1, available_now=True
    )
    q.awaitTermination(300)
    assert inc.n_batches == 3  # one micro-batch per file

    got = {
        (r["doc_id"], r["cluster_id"]) for r in inc.assignments.collect()
    }
    out = DedupPipeline(spark, cfg).run(docs, text_col="text", id_col="doc_id")
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in out["assignments"].select("doc_id", "cluster_id").collect()
    }
    assert got == want


def test_stream_restart_exactly_once(spark, tmp_path):
    """Restart semantics: a new stream query (fresh IncrementalDedup
    instance) over the same streaming checkpoint + state_dir must process
    ONLY files that arrived after the first drain — already-folded batches
    are not replayed into the state — and the final clustering equals a
    global batch run over everything."""
    docs = webtext_spark_df(spark, 180, seed=7).select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def arrive(i, lo, hi):
        stage = str(tmp_path / f"stage{i}")
        (
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))

    cfg = DedupConfig(threshold=0.3, shingle_size=4)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    arrive(0, 0, 60)
    arrive(1, 60, 120)
    inc1 = IncrementalDedup(spark, cfg, state_dir=state)
    q1 = stream_ingest(spark, in_dir, SCHEMA, inc1, ckpt, max_files_per_trigger=1)
    q1.awaitTermination(300)
    assert inc1.n_batches >= 2

    arrive(2, 120, 180)
    inc2 = IncrementalDedup(spark, cfg, state_dir=state)
    batches_before = inc2.n_batches  # 1 = "prior state exists" marker
    q2 = stream_ingest(spark, in_dir, SCHEMA, inc2, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(300)
    # only the NEW file folded — b0/b1 were not replayed into the state
    assert inc2.n_batches == batches_before + 1
    assert inc2.signatures.count() == 180  # no duplicated docs in state

    got = {(r["doc_id"], r["cluster_id"]) for r in inc2.assignments.collect()}
    out = DedupPipeline(spark, cfg).run(docs, text_col="text", id_col="doc_id")
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in out["assignments"].select("doc_id", "cluster_id").collect()
    }
    assert got == want


def test_checkpoint_namespace_spelling_invariance(tmp_path, monkeypatch):
    """ADVICE r03: the replay-protection namespace must be invariant to
    how the same local checkpoint dir is spelled — otherwise a restart
    with a different spelling defeats commit-log replay recognition and
    double-ingests replayed batches."""
    from sparkdedup.streaming import checkpoint_namespace

    d = tmp_path / "ckpt"
    d.mkdir()
    ns = checkpoint_namespace(str(d))
    assert checkpoint_namespace(str(d) + "/") == ns
    assert checkpoint_namespace("file://" + str(d)) == ns
    monkeypatch.chdir(tmp_path)
    assert checkpoint_namespace("ckpt") == ns
    link = tmp_path / "ckpt_link"
    link.symlink_to(d)
    assert checkpoint_namespace(str(link)) == ns
    # different dirs still get different namespaces
    other = tmp_path / "ckpt2"
    other.mkdir()
    assert checkpoint_namespace(str(other)) != ns
    # remote URIs: strip trailing separator only
    assert checkpoint_namespace("hdfs://nn/ck/") == checkpoint_namespace("hdfs://nn/ck")


def test_checkpoint_namespace_marker_survives_move(tmp_path):
    """ADVICE r04: the namespace is persisted in a _sparkdedup_ns marker
    inside the checkpoint dir, so even MOVING the checkpoint tree to a new
    path (where realpath derivation would disagree) keeps the namespace —
    replayed batches stay recognized by the commit log."""
    from sparkdedup.streaming import checkpoint_namespace

    d = tmp_path / "ckpt_a"
    ns = checkpoint_namespace(str(d))
    assert (d / "_sparkdedup_ns").read_text().strip() == ns
    moved = tmp_path / "ckpt_moved"
    d.rename(moved)
    assert checkpoint_namespace(str(moved)) == ns
    # a genuinely fresh dir at the OLD path gets a fresh marker of its own
    assert checkpoint_namespace(str(tmp_path / "ckpt_a")) == ns  # same realpath derivation
