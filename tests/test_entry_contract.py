"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row counts + order-insensitive values (columns sorted by name,
rows sorted), at sf0.001 for speed (driver runs sf0.01)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
# The fixture-backed oracles (tools/gen_expected_fixtures.py) are
# precomputed expected outputs for the sf0.01 corpus — the sf the driver
# actually checks — so those queries must run against sf0.01 here too
# (their oracle SQL reads the fixture parquet directly, not the views).
FIXTURE_SF = "/root/testdata/sf0.01"
FIXTURE_QUERIES = {
    "dedup_minhash_assignments",
    "dedup_minhash_edges",
    "dedup_simhash_candidates",
}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_vs_oracle(spark, name):
    q = entry_mod.queries()[name]
    sf_dir = FIXTURE_SF if name in FIXTURE_QUERIES else SF_DIR
    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = _duck(entry_mod.oracle_sql()[name])
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


def test_rows_only_queries_run(spark):
    """Non-SQL-expressible queries must still run and return rows with a
    stable schema."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "cluster_id", "certainty"}
