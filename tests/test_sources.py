"""Corpus source tests: text/id column detection parity (main.py:406-419,
benchmark_performance.py:73-75) and CSV/parquet ingestion."""

import pytest

from sparkdedup.io.sources import detect_id_column, detect_text_column, read_corpus


def test_detect_text_column_exact(spark):
    df = spark.createDataFrame([(1, "x")], "id long, ` Text ` string")
    assert detect_text_column(df) == " Text "


def test_detect_text_column_relaxed(spark):
    df = spark.createDataFrame([(1, "x")], "id long, body_text string")
    with pytest.raises(ValueError):
        detect_text_column(df, relaxed=False)
    assert detect_text_column(df, relaxed=True) == "body_text"


def test_detect_id_column_priority(spark):
    df = spark.createDataFrame([(1, 2, "x")], "index long, doc_id long, text string")
    # candidate list order: 'id', 'doc_id', ... -> doc_id before index
    assert detect_id_column(df) == "doc_id"


def test_read_corpus_csv(spark, tmp_path):
    p = str(tmp_path / "corpus_csv")
    spark.createDataFrame(
        [(0, "hello world"), (1, "goodbye world")], "id long, TEXT string"
    ).write.option("header", "true").csv(p)
    df = read_corpus(spark, p, fmt="csv")
    rows = {r["doc_id"]: r["text"] for r in df.select("doc_id", "text").collect()}
    assert rows == {0: "hello world", 1: "goodbye world"}


def test_read_corpus_url_derivation(spark, tmp_path):
    p = str(tmp_path / "corpus_parquet")
    spark.createDataFrame(
        [("https://a.example/1", "doc a"), ("https://b.example/2", "doc b")],
        "url string, text string",
    ).write.parquet(p)
    df = read_corpus(spark, p)
    assert df.select("doc_id").distinct().count() == 2


def test_id_collision_check(spark):
    from sparkdedup.io.sources import check_id_collisions
    import pytest as _pytest
    from pyspark.sql import functions as F

    ok = spark.createDataFrame(
        [("u1", 1), ("u2", 2)], "url string, doc_id long"
    )
    check_id_collisions(ok)  # no raise

    collided = spark.createDataFrame(
        [("u1", 1), ("u2", 1)], "url string, doc_id long"
    )
    with _pytest.raises(ValueError, match="collision"):
        check_id_collisions(collided)


def test_read_corpus_catalog_table(spark):
    """fmt='table' resolves a catalog table (the Iceberg path on a real
    cluster) through spark.table — same normalization as file sources."""
    from sparkdedup.io.sources import read_corpus

    spark.createDataFrame(
        [(1, "hello world"), (2, "other doc")], "doc_id long, text string"
    ).createOrReplaceTempView("corpus_tbl")
    df = read_corpus(spark, "corpus_tbl", fmt="table")
    assert {r["doc_id"] for r in df.select("doc_id").collect()} == {1, 2}
    assert "text" in df.columns


def test_read_corpus_noncastable_id_raises(spark, tmp_path):
    """ADVICE r03: a non-numeric string id column must fail loudly, not
    silently cast every doc_id to NULL and cluster garbage."""
    p = str(tmp_path / "corpus_badid")
    spark.createDataFrame(
        [("doc-a", "hello"), ("doc-b", "world")], "id string, text string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="does not cast losslessly"):
        read_corpus(spark, p)


def test_read_corpus_numeric_string_id_ok(spark, tmp_path):
    """Numeric STRINGS (the common CSV case) cast cleanly and must pass
    the null-introduction check."""
    p = str(tmp_path / "corpus_strid")
    spark.createDataFrame(
        [("7", "hello"), ("8", "world")], "id string, text string"
    ).write.parquet(p)
    df = read_corpus(spark, p)
    assert {r["doc_id"] for r in df.select("doc_id").collect()} == {7, 8}


def test_read_corpus_bad_id_named_doc_id_raises(spark, tmp_path):
    """Review r04: validation must not be defeated when the id column is
    literally named 'doc_id' (withColumn replaces it, so a post-cast
    check would see the already-cast column and skip)."""
    p = str(tmp_path / "corpus_docid_str")
    spark.createDataFrame(
        [("doc-a", "hello"), ("doc-b", "world")], "doc_id string, text string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="does not cast losslessly"):
        read_corpus(spark, p)


def test_read_corpus_fractional_id_raises(spark, tmp_path):
    """ADVICE r04: fractional numeric ids truncate under try_cast('long')
    — 3.1 and 3.9 would silently collide onto doc_id=3.  Must raise."""
    p = str(tmp_path / "corpus_fracid")
    spark.createDataFrame(
        [(3.1, "hello"), (3.9, "world")], "id double, text string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="does not cast losslessly"):
        read_corpus(spark, p)


def test_read_corpus_integral_double_id_ok(spark, tmp_path):
    """Whole-valued doubles (a parquet file written from pandas without
    an int dtype — common) round-trip exactly and must pass."""
    p = str(tmp_path / "corpus_dblid")
    spark.createDataFrame(
        [(3.0, "hello"), (4.0, "world")], "id double, text string"
    ).write.parquet(p)
    df = read_corpus(spark, p)
    assert {r["doc_id"] for r in df.select("doc_id").collect()} == {3, 4}


def test_read_corpus_fractional_decimal_id_raises(spark, tmp_path):
    p = str(tmp_path / "corpus_decid")
    from decimal import Decimal

    spark.createDataFrame(
        [(Decimal("1.5"), "hello"), (Decimal("2.0"), "world")],
        "id decimal(10,2), text string",
    ).write.parquet(p)
    with pytest.raises(ValueError, match="does not cast losslessly"):
        read_corpus(spark, p)
