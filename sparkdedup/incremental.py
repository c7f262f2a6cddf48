"""Incremental ingest: fold a NEW batch of documents into an existing
clustered corpus — the capability the reference's multi-batch /
"streaming" engines provide (SURVEY.md §2.4 L3/L4, §2.9 O4), re-expressed
for Spark's execution model.

The reference keeps a growing in-memory LSH index and queries it per new
doc.  Here the persisted state IS three checkpoint tables:

    signatures(doc_id, sig)     bands(band_key, doc_id)     edges(src, dst, sim)

A new batch is signed, banded, joined against new+old bands (the old side
is touched ONLY on the new batch's band keys — a semi-join-pruned read,
the shuffle analogue of "query the index"), verified, unioned into edges,
and the connected components recomputed over the (pruned) affected
subgraph plus untouched assignments.  Wrap `ingest_batch` in
``foreachBatch`` of a Structured Streaming reader for continuous ingest.

Semantics match one global uncapped run over old+new (the reference's
ordering guards exist only to avoid double-counting; src<dst subsumes
them) — verified in tests/test_incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.operators.bands import explode_bands
from sparkdedup.operators.connected_components import (
    assignments_from_components,
    connected_components,
)
from sparkdedup.operators.pairs import candidate_pairs
from sparkdedup.operators.verify import verify_pairs
from sparkdedup.pipeline import DedupPipeline


class IncrementalDedup:
    """State tables live in memory as checkpointed DataFrames; persist
    them to Iceberg/parquet between runs in production."""

    def __init__(self, spark: SparkSession, config: DedupConfig | None = None):
        self.spark = spark
        self.config = config or DedupConfig()
        self.pipe = DedupPipeline(spark, self.config)
        self.signatures: DataFrame | None = None
        self.bands: DataFrame | None = None
        self.edges: DataFrame | None = None

    def ingest_batch(self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """Add a batch; returns full updated assignments (doc_id,
        cluster_id) over everything ingested so far."""
        c = self.config
        b, r = c.bands_rows()

        clean = self.pipe.normalize(docs, text_col, id_col)
        new_sigs = self.pipe.signatures(clean).localCheckpoint(eager=True)
        new_bands = explode_bands(new_sigs, b, r).localCheckpoint(eager=True)

        if self.signatures is None:
            all_sigs, all_bands = new_sigs, new_bands
            touched_bands = new_bands
        else:
            all_sigs = self.signatures.unionByName(new_sigs).localCheckpoint(eager=True)
            all_bands = self.bands.unionByName(new_bands).localCheckpoint(eager=True)
            # the "index query": only old band rows sharing a new band key
            # participate — semi-join prune instead of a full re-shuffle
            old_hits = self.bands.join(
                new_bands.select("band_key").distinct(), "band_key", "leftsemi"
            )
            touched_bands = old_hits.unionByName(new_bands)

        new_pairs = candidate_pairs(
            touched_bands,
            salt_threshold=c.band_salt_threshold,
            drop_threshold=c.band_drop_threshold,
        )
        new_edges = verify_pairs(new_pairs, all_sigs, c.threshold, c.num_perm)
        if self.edges is None:
            edges = new_edges
        else:
            # old-old pairs recomputed inside touched bands are dup rows;
            # distinct on the pair key collapses them (sim is a pure
            # function of the pair, so picking either copy is exact)
            edges = self.edges.unionByName(new_edges).dropDuplicates(["src", "dst"])
        edges = edges.localCheckpoint(eager=True)

        self.signatures, self.bands, self.edges = all_sigs, all_bands, edges

        star = connected_components(edges)
        return assignments_from_components(
            all_sigs.select("doc_id"), star, dense=False
        )
