"""Vectorized datasketch-compatible MinHash core (pure numpy, no Spark).

Reproduces, bit-for-bit, the signature chain the reference uses
(SURVEY.md §2.3 S2-S4):

    text --char k-grams--> md5 -> 128-bit int          (shingle_generator.py:9-15,
                                                        deterministic_hash.py:10-11)
    shingle int -> str(int).encode('utf-8')            (minhash_processor.py:14-15)
    bytes -> sha1, first 4 bytes little-endian uint32  (datasketch sha1_hash32)
    per permutation j:  ((a_j*h + b_j) mod 2^64) mod (2^61-1)  &  (2^32-1)
    signature = elementwise min, init 2^32-1           (datasketch MinHash, MIT)

The (a_j, b_j) stream is drawn from numpy.RandomState(seed) with the exact
interleaved scalar-call pattern datasketch uses, so permutations are
identical for a given (num_perm, seed).  NOTE: the `% _MERSENNE` happens on
numpy uint64 values that have ALREADY wrapped mod 2^64 — this wrap is part
of the published semantics and is preserved here.

datasketch is not vendored or imported; this file implements the published
algorithm (github.com/ekzhu/datasketch, MIT) from its specification.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)
_EMPTY_TOKEN = b"empty_document"  # minhash_processor.py:12


def sha1_hash32(data: bytes) -> int:
    """First 4 bytes of sha1(data) as little-endian uint32."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) universal-hash parameter arrays, uint64.

    Must use interleaved *scalar* randint calls (a_0, b_0, a_1, b_1, ...)
    — a batched draw consumes the MT19937 stream differently and would
    break signature parity with the reference.
    """
    gen = np.random.RandomState(seed)
    mp = int(_MERSENNE)
    ab = np.array(
        [
            (
                gen.randint(1, mp, dtype=np.uint64),
                gen.randint(0, mp, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    return ab[0], ab[1]


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def cached_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = permutations(num_perm, seed)
    return _PERM_CACHE[key]


def shingle_hash32(text: str, shingle_size: int, cache: dict | None = None) -> np.ndarray:
    """uint64 array of the 32-bit feature hashes for one document.

    Chain: k-gram -> md5 -> decimal string -> sha1_hash32.  Empty text maps
    to the single 'empty_document' token (shingle_generator.py:10-11 +
    minhash_processor.py:11-12).  `cache` memoizes k-gram -> hash across
    documents in a batch (web boilerplate repeats heavily).
    """
    if not text:
        grams: list[str] = []
    elif len(text) < shingle_size:
        grams = [text]
    else:
        grams = [text[i : i + shingle_size] for i in range(len(text) - shingle_size + 1)]

    if not grams:
        return np.array([sha1_hash32(_EMPTY_TOKEN)], dtype=np.uint64)

    # within-doc dedup BEFORE hashing: the signature is a min over the
    # shingle set, so repeated k-grams contribute nothing — skip their
    # md5+sha1 entirely (the downstream np.unique then sees unique hashes)
    grams = set(grams)
    if cache is None:
        cache = {}
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = cache.get(g)
        if h is None:
            md5_int = int(hashlib.md5(g.encode("utf-8")).hexdigest(), 16)
            h = sha1_hash32(str(md5_int).encode("utf-8"))
            cache[g] = h
        out[i] = h
    return out


def signature_from_hashes(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) from a vector of feature hashes.

    Duplicate feature hashes are harmless (min is idempotent) but deduping
    first shrinks the matrix, so we unique() — result is identical.
    """
    hv = np.unique(hashes)  # uint64
    # (n, p) universal hash with mod-2^64 wraparound, matching per-update
    # numpy semantics of the reference chain.
    phv = (hv[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    phv &= _MAX_HASH
    return phv.min(axis=0)


def minhash_signature(
    text: str,
    shingle_size: int,
    num_perm: int = 64,
    seed: int = 42,
    cache: dict | None = None,
) -> np.ndarray:
    a, b = cached_permutations(num_perm, seed)
    return signature_from_hashes(shingle_hash32(text, shingle_size, cache), a, b)


def batch_signatures(
    texts, shingle_size: int, num_perm: int = 64, seed: int = 42
) -> np.ndarray:
    """Signatures for an iterable of texts -> (n, num_perm) uint64 matrix.

    Shares one k-gram hash cache across the batch (Arrow-batch granularity
    when called from the pandas UDF in functions/signatures.py).
    """
    a, b = cached_permutations(num_perm, seed)
    cache: dict = {}
    texts = list(texts)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = signature_from_hashes(
            shingle_hash32("" if t is None else str(t), shingle_size, cache), a, b
        )
    return out


def jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Signature-estimate Jaccard = fraction of equal positions — the
    reference verifies candidates with THIS estimate, not exact set
    Jaccard (cluster_in_mem.py:196)."""
    return float(np.count_nonzero(sig1 == sig2)) / float(len(sig1))
