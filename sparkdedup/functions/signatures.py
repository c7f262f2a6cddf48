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


def signature_batches(shingle_size: int, num_perm: int, seed: int, id_field: str,
                      text_field: str, with_simhash: bool = False):
    """mapInArrow kernel: (id, text) RecordBatches -> (id, sig[, simhash])
    batches.

    mapInArrow (not a pandas UDF) because building the list<int64>
    signature column via pa.ListArray.from_arrays on a flat matrix is
    ~500x faster than pandas->Arrow conversion of a Series of arrays
    (measured 3.3s vs 0.006s per 25k rows) — the UDF return path was the
    signatures stage's dominant cost, not the hashing.

    with_simhash=True fuses the complementary SimHash pass (north_star)
    into the same text scan — one extra int64 column, no second Python
    stage over the corpus."""

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
            cols = [ids, sig_col]
            names = ["doc_id", "sig"]
            if with_simhash:
                cols.append(pa.array(simhash_batch(texts, shingle_size)))
                names.append("simhash")
            yield pa.RecordBatch.from_arrays(cols, names)

    return gen


def attach_signatures(df, shingle_size: int, num_perm: int = 64, seed: int = 42,
                      id_col: str = "doc_id", text_col: str = "clean",
                      spread: bool = True, with_simhash: bool = False):
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
    schema = "doc_id long, sig array<bigint>"
    if with_simhash:
        schema += ", simhash long"
    return src.mapInArrow(
        signature_batches(shingle_size, num_perm, seed, "doc_id", "_sig_text",
                          with_simhash=with_simhash),
        schema,
    )


_SIMHASH_CACHE: dict = {}  # worker-persistent gram -> uint64 feature hash


def _simhash_cache() -> dict:
    global _SIMHASH_CACHE
    if len(_SIMHASH_CACHE) > _GRAM_CACHE_MAX:
        _SIMHASH_CACHE = {}
    return _SIMHASH_CACHE


def _simhash_grams(text: str, shingle_size: int) -> list[str]:
    if not text:
        return []
    if len(text) < shingle_size:
        return [text]
    return [text[i : i + shingle_size] for i in range(len(text) - shingle_size + 1)]


_EMPTY_SIMHASH = None


def _empty_simhash() -> int:
    global _EMPTY_SIMHASH
    if _EMPTY_SIMHASH is None:
        h = int.from_bytes(hashlib.md5(b"empty_document").digest()[8:], "big")
        _EMPTY_SIMHASH = int(np.uint64(h).astype(np.int64))
    return _EMPTY_SIMHASH


def simhash_batch(texts, shingle_size: int, cache: dict | None = None) -> np.ndarray:
    """Vectorized SimHash for a batch -> int64[n].

    One concatenated gram-hash array for the whole batch (gram multiplicity
    preserved — each occurrence votes), bit matrix + per-document
    ``np.add.reduceat`` for the bit votes, then a vectorized sign->bit
    pack.  Replaces the per-row ``s.map(simhash64_text)`` path (measured
    16.4 s for 5k docs in round 1); the gram cache is worker-persistent
    like the MinHash one.  Bit-identical to ``simhash64_text``.
    """
    if cache is None:
        cache = _simhash_cache()
    texts = ["" if t is None else str(t) for t in texts]
    n = len(texts)
    out = np.empty(n, dtype=np.int64)
    hashes: list[int] = []
    counts = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        grams = _simhash_grams(t, shingle_size)
        counts[i] = len(grams)
        for g in grams:
            v = cache.get(g)
            if v is None:
                v = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:], "big")
                cache[g] = v
            hashes.append(v)
    if not hashes:
        out[:] = _empty_simhash()
        return out
    H = np.array(hashes, dtype=np.uint64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    # chunk the (grams x 64) bit matrix so transient memory stays ~16 MB
    # regardless of batch size; chunk boundaries align to document starts
    out_u = np.zeros((n, 64), dtype=np.int64)
    CHUNK = 1 << 18
    doc_starts = offsets
    c0 = 0
    while c0 < n:
        c1 = c0 + 1
        while c1 < n and doc_starts[c1] - doc_starts[c0] < CHUNK:
            c1 += 1
        lo = int(doc_starts[c0])
        hi = int(doc_starts[c1]) if c1 < n else len(H)
        if hi > lo:
            # uint8 bit matrix via flat unpackbits (little-endian uint64
            # bytes -> bit j of H in column j).  NOT the broadcast
            # `(H[:,None] >> shifts) & 1`: that allocates a gram x 64
            # uint64 intermediate (measured 40 s/330k grams on this box —
            # uint64-shift slow path + first-touch page faults on the
            # 170 MB temporary); unpackbits emits uint8 directly
            # (~10 ms warm).  Accumulation dtype int64 so per-doc gram
            # counts can't overflow.
            bits = np.unpackbits(
                H[lo:hi].view(np.uint8), bitorder="little"
            ).reshape(-1, 64)
            # index only NONEMPTY docs: zero-gram docs would repeat their
            # successor's start index (reduceat misbehaves on repeats);
            # excluding them keeps indices strictly increasing and each
            # segment covering exactly one doc's grams
            nonempty = np.nonzero(counts[c0:c1] > 0)[0]
            idx = (doc_starts[c0:c1][nonempty] - lo).astype(np.int64)
            out_u[nonempty + c0] = np.add.reduceat(bits, idx, axis=0, dtype=np.int64)
        c0 = c1
    votes = out_u * 2 - counts[:, None]
    packed = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out = packed.astype(np.int64)
    out[counts == 0] = _empty_simhash()
    return out


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
        vals = simhash_batch(s.tolist(), shingle_size)
        out = pd.Series(vals, index=s.index, dtype="Int64")
        out[s.isna()] = None
        return out

    return _simhash
