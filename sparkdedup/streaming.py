"""Structured Streaming ingest: continuous near-duplicate clustering over
an arriving document stream (SURVEY.md §2.10; reference analogue: the
multi-batch streaming engine `cluster_streaming.py`, which folds batches
into a growing in-memory LSH index).

Spark-first shape: `readStream` on a file/table source, `foreachBatch`
folding every micro-batch through :class:`~sparkdedup.incremental.
IncrementalDedup` (O(delta) signing/banding/pairing + O(delta) contracted
connected components), with Spark's own streaming checkpoint giving
exactly-once batch replay on restart and the incremental `state_dir`
persisting the dedup state itself.

Why foreachBatch and not a stateful operator: LSH dedup needs a GLOBAL
band index (any new doc can pair with any prior doc), which does not fit
`applyInPandasWithState`'s per-key state partitioning — the band tables
ARE the state, and they live where big state belongs: in tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from sparkdedup.incremental import IncrementalDedup


def stream_ingest(
    spark: SparkSession,
    input_path: str,
    schema: StructType | str,
    inc: IncrementalDedup,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start a streaming query folding parquet files under ``input_path``
    into ``inc``.  Returns the StreamingQuery (caller awaits termination).

    available_now=True drains everything currently available then stops —
    the batch-backfill mode; pass False for a continuously running query.
    ``max_files_per_trigger`` bounds micro-batch size (and at 1, makes one
    micro-batch per file — deterministic batching for tests)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def _fold(batch_df, batch_id: int) -> None:
        # ingest_batch materializes its own deltas; empty replayed batches
        # (post-restart) fold as no-ops
        if batch_df.isEmpty():
            return
        inc.ingest_batch(batch_df, text_col=text_col, id_col=id_col)

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
