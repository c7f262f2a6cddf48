"""Structured Streaming ingest: continuous near-duplicate clustering over
an arriving document stream (SURVEY.md §2.10; reference analogue: the
multi-batch streaming engine `cluster_streaming.py`, which folds batches
into a growing in-memory LSH index).

Spark-first shape: `readStream` on a file/table source, `foreachBatch`
folding every micro-batch through :class:`~sparkdedup.incremental.
IncrementalDedup` (O(delta) signing/banding/pairing + O(delta) contracted
connected components).  foreachBatch delivery is AT-LEAST-ONCE (Spark
replays the in-flight batch after a crash); state updates are still
exactly-once because the micro-batch id is passed into ``ingest_batch``,
whose commit-log protocol makes replayed batches no-ops and torn writes
invisible (see IncrementalDedup docstring).  Spark's streaming checkpoint
tracks source progress; the incremental ``state_dir`` holds the dedup
state itself.

Why foreachBatch and not a stateful operator: LSH dedup needs a GLOBAL
band index (any new doc can pair with any prior doc), which does not fit
`applyInPandasWithState`'s per-key state partitioning — the band tables
ARE the state, and they live where big state belongs: in tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from sparkdedup.incremental import IncrementalDedup


def checkpoint_namespace(checkpoint_dir: str) -> str:
    """Stable 8-hex namespace for a streaming checkpoint directory.

    Micro-batch ids restart from 0 for a NEW checkpoint, and a fresh
    stream pointed at an EXISTING state_dir must not have its batch 0
    mistaken for the old stream's committed batch 0 — so batch tokens are
    namespaced by the checkpoint identity.  The identity is the REALPATH
    (ADVICE r03): restarting the same stream with a different spelling of
    the same local directory (relative vs absolute, trailing slash,
    symlink) must keep the same namespace, or replayed batches stop being
    recognized by the commit log and get double-ingested.  Non-local
    checkpoint URIs (hdfs://, s3a://...) only get the trailing-separator
    strip — realpath is a local-filesystem concept."""
    import hashlib
    import os

    ident = checkpoint_dir.rstrip("/")
    if "://" not in ident or ident.startswith("file://"):
        local = ident[len("file://"):] if ident.startswith("file://") else ident
        ident = os.path.realpath(local)
    return hashlib.md5(ident.encode("utf-8")).hexdigest()[:8]


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

    stream_ns = checkpoint_namespace(checkpoint_dir)
    # migration guard (review r04): states written BEFORE the realpath
    # normalization used md5(raw checkpoint string) as the namespace — a
    # batch committed under that legacy token must still be recognized as
    # committed, or the post-upgrade restart of an in-flight stream
    # double-ingests it
    import hashlib

    legacy_ns = hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:8]

    def _fold(batch_df, batch_id: int) -> None:
        # the namespaced batch_id makes replayed deliveries idempotent
        # (commit-log skip); empty batches fold as no-ops
        if batch_df.isEmpty():
            return
        if legacy_ns != stream_ns and inc._is_committed(f"b{legacy_ns}-{batch_id}"):
            return  # committed by a pre-upgrade run under the legacy namespace
        inc.ingest_batch(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            batch_id=f"{stream_ns}-{batch_id}",
        )

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
