"""Corpus sources (SURVEY.md §2.1 SRC1-SRC3, §2.2 P2).

The reference ingests arbitrary CSVs and resolves the text column by
lowercased/stripped name == 'text' (main.py:406-407), with an optional id
column from a candidate list (main.py:417-419) and benchmark-mode
relaxation to "contains 'text'" (benchmark_performance.py:73-75).  Its
60k-row / 100 MB caps are deliberately NOT reproduced — removing them is
the point of the Spark build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID_CANDIDATES = ["id", "doc_id", "document_id", "index", "number"]


def detect_text_column(df: DataFrame, relaxed: bool = False) -> str:
    """Exact reference resolution order: name == 'text' after
    lower().strip(); relaxed mode accepts the first column containing
    'text'."""
    exact = [c for c in df.columns if c.lower().strip() == "text"]
    if exact:
        return exact[0]
    if relaxed:
        loose = [c for c in df.columns if "text" in c.lower()]
        if loose:
            return loose[0]
    raise ValueError(f"no text column among {df.columns}")


def detect_id_column(df: DataFrame) -> str | None:
    lower = {c.lower().strip(): c for c in df.columns}
    for cand in ID_CANDIDATES:
        if cand in lower:
            return lower[cand]
    return None


def check_id_collisions(df: DataFrame, id_col: str = "doc_id", source_col: str = "url") -> None:
    """Fail loudly when derived ids collide (ADVICE r01): with
    doc_id = xxhash64(url), 64-bit birthday collisions are EXPECTED at the
    multi-billion-doc scale this engine targets, and a collision silently
    merges two distinct documents into one graph node, corrupting
    clusters.  Precondition: ``source_col`` values are unique (duplicate
    urls must be deduped upstream — they would pass this check while still
    merging distinct page versions)."""
    row = df.agg(
        F.countDistinct(source_col).alias("n_src"),
        F.countDistinct(id_col).alias("n_id"),
    ).collect()[0]
    if row["n_src"] != row["n_id"]:
        raise ValueError(
            f"doc_id collision: {row['n_src']} distinct {source_col} values map to "
            f"{row['n_id']} distinct {id_col} values — use a wider id (e.g. two "
            "xxhash64 salts) or dedupe the source column first"
        )


def _check_cast_nulls(df: DataFrame, icol: str) -> None:
    """Fail loudly when the id-column cast to long would manufacture
    NULLs (ADVICE r03): a non-numeric string id column casts to NULL for
    every row, and normalize() only filters null TEXT — the pipeline
    would run to completion with every doc collapsed onto doc_id=NULL,
    i.e. silently wrong clustering.  Numeric source types cast
    losslessly, so the validation scan is skipped for them.  Runs on the
    PRE-cast frame with a temp column — inspecting the output frame
    would be defeated when the id column is literally named 'doc_id'
    (withColumn replaces it, so both the dtype and the null-compare
    would see the already-cast column).  Mirrors check_id_collisions'
    fail-loud stance; one column-pruned scan on the CLI csv/json/table
    ingest path only."""
    src_type = dict(df.dtypes)[icol]
    if src_type in ("tinyint", "smallint", "int", "bigint"):
        return
    probe = df.withColumn("_cast_probe", F.col(icol).try_cast("long"))
    bad_null = F.col(icol).isNotNull() & F.col("_cast_probe").isNull()
    # NULL-introducing casts are only half the hazard (ADVICE r04): a
    # fractional numeric id (double/float/decimal-with-scale) passes the
    # null probe while try_cast('long') TRUNCATES, so distinct ids 3.1 and
    # 3.9 silently collapse onto doc_id=3 — exactly the collision class
    # check_id_collisions exists to prevent.  Probe round-trip fidelity:
    # a value whose long cast does not cast back equal had a fractional
    # part (or, for wide doubles, sat beyond exact-integer precision).
    # Strings are excluded (leading zeros etc. fail round-trip while
    # casting losslessly) — their failure mode is NULLs, caught above.
    bad = bad_null
    if src_type.startswith(("float", "double", "decimal")):
        bad = bad | (
            F.col("_cast_probe").isNotNull()
            & (F.col("_cast_probe").cast(src_type) != F.col(icol))
        )
    if probe.where(bad).limit(1).count():
        raise ValueError(
            f"id column {icol!r} (type {src_type}) does not cast losslessly to "
            "long: casting produced NULL or truncated doc_ids (fractional values "
            "would silently collide) — pass --id-col pointing at an integral "
            "column, or derive ids from a url column"
        )


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Read a corpus and normalize to (doc_id long, text string, ...rest).

    doc_id: detected id column if present, else xxhash64(all columns) is
    NOT used (unstable) — a deterministic zip-with-index over the input
    order would need a sort key; instead we require an id column or derive
    from a 'url' column when present (web-scale id assignment)."""
    if fmt == "csv":
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "table":
        # catalog table — the Iceberg path on a real cluster (north_rule:
        # "over Iceberg tables"): any catalog-registered table resolves
        # here via DataSourceV2, which owns snapshot isolation and
        # partition pruning; no Iceberg-specific code is needed engine-side
        df = spark.table(path)
    else:
        df = spark.read.parquet(path)

    tcol = text_col or detect_text_column(df, relaxed=True)
    icol = id_col or detect_id_column(df)
    if icol is not None:
        # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
        # cast of a non-numeric id THROWS at some arbitrary later action
        # with an opaque CAST_INVALID_INPUT; under non-ANSI it silently
        # NULLs every doc_id.  try_cast + the explicit check below gives
        # one immediate, named failure in both worlds.
        _check_cast_nulls(df, icol)  # pre-cast frame — see docstring
        out = df.withColumn("doc_id", F.col(icol).try_cast("long"))
    elif "url" in df.columns:
        out = df.withColumn("doc_id", F.xxhash64("url"))
        check_id_collisions(out)
    else:
        raise ValueError("no id column detected and no url column to derive one from")
    if tcol != "text":
        out = out.withColumn("text", F.col(tcol).cast("string"))
    return out
