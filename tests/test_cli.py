"""CLI contract tests (sparkdedup/cli.py): batch and --stream modes must
write the SAME output shape — assignments/ with (doc_id, cluster_id,
certainty) and edges/ with (src, dst, sim) — so consumers can switch
modes freely (ADVICE r03).  Runs main() in-process against the session
fixture; SparkSession.stop is no-op'd so the CLI's own stop() doesn't
kill the shared test session."""

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparkdedup import cli
from sparkdedup.io.webtext import webtext_spark_df


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    p = str(tmp_path / "corpus")
    webtext_spark_df(spark, 120, seed=11).select("doc_id", "text").write.parquet(p)
    return p


@pytest.fixture()
def no_stop(monkeypatch):
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)


def _read_outputs(spark, out_dir):
    a = spark.read.parquet(os.path.join(out_dir, "assignments"))
    e = spark.read.parquet(os.path.join(out_dir, "edges"))
    return a, e


def test_cli_batch_output_contract(spark, corpus_dir, tmp_path, no_stop, capsys):
    out = str(tmp_path / "out_batch")
    cli.main(["--input", corpus_dir, "--output", out, "--shingle-size", "4"])
    a, e = _read_outputs(spark, out)
    assert set(a.columns) == {"doc_id", "cluster_id", "certainty"}
    assert set(e.columns) == {"src", "dst", "sim"}
    assert a.count() == 120


def test_cli_stream_output_matches_batch(spark, corpus_dir, tmp_path, no_stop, capsys):
    """--stream over the same corpus must produce identical assignments
    (incl. certainty values) and the identical edge set as batch mode."""
    out_b = str(tmp_path / "out_batch")
    cli.main(["--input", corpus_dir, "--output", out_b, "--shingle-size", "4"])

    out_s = str(tmp_path / "out_stream")
    cli.main([
        "--input", corpus_dir, "--output", out_s, "--shingle-size", "4",
        "--stream", "--state-dir", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])

    ab, eb = _read_outputs(spark, out_b)
    as_, es = _read_outputs(spark, out_s)
    assert set(as_.columns) == set(ab.columns)
    assert set(es.columns) == set(eb.columns)

    def arows(df):
        return {
            (r["doc_id"], r["cluster_id"], round(r["certainty"], 9))
            for r in df.collect()
        }

    def erows(df):
        return {
            (r["src"], r["dst"], round(r["sim"], 9)) for r in df.collect()
        }

    assert arows(as_) == arows(ab)
    assert erows(es) == erows(eb)


def test_cli_stream_empty_input(spark, tmp_path, no_stop, capsys):
    """--stream against a not-yet-populated input dir exits cleanly."""
    empty = str(tmp_path / "empty_in")
    os.makedirs(empty)
    cli.main([
        "--input", empty, "--output", str(tmp_path / "out"),
        "--stream", "--state-dir", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    assert '"batches": 0' in capsys.readouterr().out
