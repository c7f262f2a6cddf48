"""Signature pandas UDFs: MinHash (reference-parity) and SimHash
(complementary pass per BASELINE.json north_star).

One fused UDF covers shingling + md5 + sha1 + universal-hash + min
(SURVEY.md §2.11): shingles are never materialized as a column — they live
only inside the numpy kernel, with a per-Arrow-batch k-gram hash cache
(web boilerplate repeats massively across documents in a batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from sparkdedup.minhash import cached_permutations, shingle_hash32, signature_from_hashes

# worker-persistent k-gram -> hash32 cache: python workers are reused
# across Arrow batches/tasks, and web boilerplate repeats massively.
# SMALL cap on purpose: a multi-million-entry dict spills out of LLC and
# every lookup becomes a DRAM round-trip — measured 234 vs 403 docs/s/core
# at 4M vs 100k entries; with many workers per node the big dict also
# saturates memory bandwidth and per-worker throughput collapses.
_GRAM_CACHE: dict = {}
_GRAM_CACHE_MAX = 100_000


def _gram_cache() -> dict:
    global _GRAM_CACHE
    if len(_GRAM_CACHE) > _GRAM_CACHE_MAX:
        _GRAM_CACHE = {}
    return _GRAM_CACHE


def signature_batches(shingle_size: int, num_perm: int, seed: int, id_field: str, text_field: str):
    """mapInArrow kernel: (id, text) RecordBatches -> (id, sig) batches.

    mapInArrow (not a pandas UDF) because building the list<int64>
    signature column via pa.ListArray.from_arrays on a flat matrix is
    ~500x faster than pandas->Arrow conversion of a Series of arrays
    (measured 3.3s vs 0.006s per 25k rows) — the UDF return path was the
    signatures stage's dominant cost, not the hashing."""

    def gen(batches):
        a, b = cached_permutations(num_perm, seed)
        cache = _gram_cache()
        for batch in batches:
            ids = batch.column(id_field)
            texts = batch.column(text_field).to_pylist()
            n = len(texts)
            mat = np.empty((n, num_perm), dtype=np.int64)
            for i, t in enumerate(texts):
                sig = signature_from_hashes(
                    shingle_hash32("" if t is None else str(t), shingle_size, cache),
                    a,
                    b,
                )
                mat[i] = sig.astype(np.int64)
            offsets = pa.array(np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32))
            sig_col = pa.ListArray.from_arrays(offsets, pa.array(mat.reshape(-1)))
            yield pa.RecordBatch.from_arrays([ids, sig_col], ["doc_id", "sig"])

    return gen


def attach_signatures(df, shingle_size: int, num_perm: int = 64, seed: int = 42,
                      id_col: str = "doc_id", text_col: str = "clean",
                      spread: bool = True):
    """(id, text, ...) -> (doc_id, sig array<long>) via mapInArrow.

    Parity chain per minhash_processor.py:5-16 + shingle_generator.py:9-15
    (see sparkdedup/minhash.py docstring)."""
    src = df.select(
        df[id_col].alias("doc_id"), df[text_col].alias("_sig_text")
    )
    # even spread over all cores: upstream joins/AQE-coalesced shuffles (or
    # a single-row-group parquet scan) can hand this stage too few (or
    # skewed) partitions, serializing the python kernel — the explicit
    # round-robin costs one narrow shuffle of (id, text) and guarantees
    # full worker utilization.  Pass spread=False when the caller already
    # repartitioned the text upstream (e.g. DedupPipeline.normalize) —
    # exactly one spreading shuffle should exist before the Python stages.
    if spread:
        sc = df.sparkSession.sparkContext
        src = src.repartition(sc.defaultParallelism)
    return src.mapInArrow(
        signature_batches(shingle_size, num_perm, seed, "doc_id", "_sig_text"),
        "doc_id long, sig array<bigint>",
    )


def simhash64_text(text: str, shingle_size: int, cache: dict | None = None) -> int:
    """64-bit SimHash over the same char k-gram features as MinHash.

    Feature hash = low 64 bits of md5(k-gram); unit weights with
    multiplicity.  Returned as signed int64 (two's complement) for Spark's
    LongType.  No reference equivalent (north_star addition).
    """
    if cache is None:
        cache = {}
    if not text:
        grams = []
    elif len(text) < shingle_size:
        grams = [text]
    else:
        grams = [text[i : i + shingle_size] for i in range(len(text) - shingle_size + 1)]
    if not grams:
        h = int.from_bytes(hashlib.md5(b"empty_document").digest()[8:], "big")
        return np.uint64(h).astype(np.int64).item()

    hs = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        v = cache.get(g)
        if v is None:
            v = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:], "big")
            cache[g] = v
        hs[i] = v
    # vote per bit: +1 if set, -1 if clear; sign -> bit
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(grams)
    out = np.uint64(0)
    for j in range(64):
        if votes[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return out.astype(np.int64).item()


def simhash_udf(shingle_size: int):
    @pandas_udf(LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series(
            [None if t is None else simhash64_text(str(t), shingle_size, cache) for t in s],
            dtype="Int64",
        )

    return _simhash
