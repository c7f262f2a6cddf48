"""sparkdedup — a PySpark-native near-duplicate detection + clustering engine.

From-scratch reimplementation of the *capabilities* of the reference
(lrecdemo/minhash-sim-search, see /root/repo/SURVEY.md) as an idiomatic
Spark DataFrame pipeline:

    ingest -> normalize -> [exact-dup pre-pass] -> minhash signatures ->
    LSH bands -> candidate pairs -> jaccard verify -> connected components ->
    dense relabel -> certainty -> assignments

All heavy math runs in vectorized numpy inside Arrow-batched pandas UDFs;
everything relational is plain DataFrame ops so Catalyst/AQE optimize the
plan.  Designed for web-scale inputs (explicit shuffle keys, skew handling,
checkpointed stages); tested single-node on local[N].
"""

from sparkdedup.config import DedupConfig, optimal_param
from sparkdedup.incremental import IncrementalDedup
from sparkdedup.pipeline import DedupPipeline, build_spark

__all__ = [
    "DedupConfig",
    "DedupPipeline",
    "IncrementalDedup",
    "build_spark",
    "optimal_param",
]
__version__ = "0.1.0"
