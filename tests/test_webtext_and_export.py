"""Fixture-generator determinism + export operator tests."""

import os

from sparkdedup.functions.extract import extract_text_bytes
from sparkdedup.io.export import reorder_for_export, export_results
from sparkdedup.io.webtext import generate_webtext


def test_generator_deterministic():
    a = generate_webtext(300, seed=42)
    b = generate_webtext(300, seed=42)
    assert a.equals(b)
    c = generate_webtext(300, seed=7)
    assert not a["text"].equals(c["text"])


def test_generator_edge_cases_present():
    pdf = generate_webtext(300, seed=42)
    texts = pdf["text"].tolist()
    assert "" in texts
    assert any(t and not t.strip() for t in texts)  # whitespace-only
    assert len(texts) != len(set(texts))  # exact duplicates
    assert any(ord(ch) > 0x370 for t in texts for ch in t)  # greek row


def test_html_roundtrip_invariant():
    """BASELINE input_hint per-row invariant: extract_text(html) must be
    byte-identical to the text column for every row."""
    pdf = generate_webtext(400, seed=42)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text_bytes(html) == text


def test_reorder_for_export(spark):
    df = spark.createDataFrame(
        [(1, "x", 0, 0.9, 1, 0, "minhash_lsh")],
        "extra long, text string, id long, certainty double, cluster_id long,"
        " original_index long, clustering_method string",
    )
    out = reorder_for_export(df)
    assert out.columns[:2] == ["extra", "text"]
    assert out.columns[-1] == "clustering_method"
    only = reorder_for_export(df, clustering_only=True)
    assert set(only.columns) == {
        "id", "cluster_id", "certainty", "original_index", "clustering_method"
    }


def test_export_csv_json(spark, tmp_path):
    df = spark.createDataFrame([(0, "a", 0), (1, "b", 0)], "id long, text string, cluster_id long")
    p_csv = str(tmp_path / "out_csv")
    p_json = str(tmp_path / "out_json")
    export_results(df, p_csv, fmt="csv", single_file=True)
    export_results(df, p_json, fmt="json", single_file=True)
    assert any(f.endswith(".csv") for f in os.listdir(p_csv))
    back = spark.read.option("header", "true").csv(p_csv)
    assert back.count() == 2
    assert spark.read.json(p_json).count() == 2
