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
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from sparkdedup.minhash import cached_permutations, shingle_hash32, signature_from_hashes


def minhash_udf(shingle_size: int, num_perm: int = 64, seed: int = 42):
    """clean_text string -> signature array<long> (num_perm values < 2^32).

    Parity chain per minhash_processor.py:5-16 + shingle_generator.py:9-15
    (see sparkdedup/minhash.py docstring).
    """

    @pandas_udf(ArrayType(LongType()))
    def _minhash(s: pd.Series) -> pd.Series:
        a, b = cached_permutations(num_perm, seed)
        cache: dict = {}
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            sig = signature_from_hashes(shingle_hash32(str(t), shingle_size, cache), a, b)
            out.append(sig.astype(np.int64))  # values < 2^32: safe signed cast
        return pd.Series(out)

    return _minhash


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
