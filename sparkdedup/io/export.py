"""Result export (SURVEY.md §2.1 SNK1/SNK2, §2.2 P8).

The reference exports a pandas DataFrame to CSV/JSON with the clustering
columns moved last, or a 6-column "clustering-only" projection
(main.py:285-294, :763-796).  Spark's writers handle type coercion
(NaN->null, timestamps) natively; the operator here is just the column
ordering/projection plus the writer dispatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# reference clustering-result columns, in its export order (main.py:289)
CLUSTERING_COLS = [
    "id",
    "cluster_id",
    "certainty",
    "original_index",
    "batch_id",
    "clustering_method",
]


def reorder_for_export(df: DataFrame, clustering_only: bool = False) -> DataFrame:
    """Original columns first, clustering columns last (P8); or the
    clustering-only projection."""
    present = [c for c in CLUSTERING_COLS if c in df.columns]
    if clustering_only:
        return df.select(*present)
    original = [c for c in df.columns if c not in present]
    return df.select(*original, *present)


def export_results(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    clustering_only: bool = False,
    single_file: bool = False,
) -> None:
    """SNK1 (csv) / SNK2 (json).  `single_file` coalesces to one output
    part — the reference's one-file semantics; leave False at scale."""
    out = reorder_for_export(df, clustering_only)
    if single_file:
        out = out.coalesce(1)
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
