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
    namespaced by the checkpoint identity.

    The identity is carried IN the checkpoint directory itself (ADVICE
    r04): the first run writes a ``_sparkdedup_ns`` marker holding the
    namespace, and every restart reads it back — so ANY later spelling of
    the directory (relative vs absolute, trailing slash, symlink, even a
    wholesale move of the checkpoint tree to a new path) keeps the
    namespace and the commit log keeps recognizing replayed batches.  When
    no marker exists yet the namespace is derived from the REALPATH
    (ADVICE r03) and then persisted.  Non-local checkpoint URIs (hdfs://,
    s3a://...) derive from the trailing-separator-stripped URI and are not
    marker-persisted (no local filesystem to write to; object-store
    spellings are canonical in practice)."""
    import hashlib
    import os

    ident = checkpoint_dir.rstrip("/")
    if "://" in ident and not ident.startswith("file://"):
        return hashlib.md5(ident.encode("utf-8")).hexdigest()[:8]
    local = ident[len("file://"):] if ident.startswith("file://") else ident
    local = os.path.realpath(local)
    marker = os.path.join(local, "_sparkdedup_ns")
    try:
        with open(marker) as f:
            stored = f.read().strip()
        if stored:
            return stored
    except OSError:
        pass
    ns = hashlib.md5(local.encode("utf-8")).hexdigest()[:8]
    try:
        os.makedirs(local, exist_ok=True)
        tmp = os.path.join(local, f".{os.getpid()}._sparkdedup_ns.tmp")
        with open(tmp, "w") as f:
            f.write(ns)
        os.replace(tmp, marker)
    except OSError:
        # read-only or racing filesystem: fall back to derived-only mode
        pass
    return ns


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
    # double-ingests it.  CAVEAT (ADVICE r04): this legacy probe uses THIS
    # invocation's spelling, so the FIRST post-upgrade restart of a
    # pre-upgrade state must reuse the old spelling of checkpoint_dir
    # (md5 namespaces cannot be inverted to enumerate other spellings).
    # From that restart on, the namespace is persisted in the checkpoint
    # dir's _sparkdedup_ns marker and every spelling works.
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
