"""Reference-algorithm oracle (pure Python, test-only, deliberately slow).

Replicates the reference pipeline exactly as it executes at
/root/reference/app/minhash_clustering/ (preprocess_helper.py,
shingle_generator.py, minhash_processor.py + public datasketch semantics,
cluster_in_mem.py SimilarityFinder uncapped, union_find.py), using
row-at-a-time loops and per-shingle updates — a code path independent of
sparkdedup's vectorized implementation, so parity tests are meaningful.

Candidate caps (max_candidates=500/150) are NOT reproduced in the parity
path: they are recall-losing single-node artifacts; at fixture scale no
doc has >500 candidates so the uncapped edge set equals the reference's
(SURVEY.md §7 risk f).  The engine's deterministic cap reformulation
(operators/pairs.py cap_pairs_per_doc) has its own independent capped
twin here (`cap_pairs_ref`) for engine-vs-oracle cap parity.
"""

from __future__ import annotations

import hashlib
import re
import struct
import unicodedata

import numpy as np

_CLEAN = re.compile(r"[^\w\s]")
_WS = re.compile(r"\s+")


def preprocess_text_ref(text, options=None):
    """Byte-identical reimplementation of preprocess_helper.py:8-36,
    including the None-vs-missing-key default quirk."""
    if options is None:
        options = {
            "lowercase": False,
            "remove_diacritics": False,
            "remove_punctuation": False,
        }
    text = str(text)
    if options.get("lowercase", True):
        text = text.lower()
    if options.get("remove_diacritics", True):
        text = unicodedata.normalize("NFD", text)
        text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        text = unicodedata.normalize("NFC", text)
    else:
        text = unicodedata.normalize("NFC", text)
    if options.get("remove_punctuation", True):
        text = _CLEAN.sub(" ", text)
    text = _WS.sub(" ", text)
    return text.strip()


def deterministic_hash_ref(text: str) -> int:
    return int(hashlib.md5(text.encode("utf-8")).hexdigest(), 16)


def shingles_ref(text: str, shingle_size: int) -> list[int]:
    if len(text) < shingle_size:
        return [deterministic_hash_ref(text)] if text else []
    return [
        deterministic_hash_ref(text[i : i + shingle_size])
        for i in range(len(text) - shingle_size + 1)
    ]


_MP = (1 << 61) - 1
_MAXH = (1 << 32) - 1


class MinHashRef:
    """Per-update loop MinHash following the published datasketch MinHash
    semantics (seeded RandomState permutations, sha1_hash32, wrap-mod-2^64
    universal hash)."""

    def __init__(self, num_perm=64, seed=42):
        gen = np.random.RandomState(seed)
        perms = np.array(
            [
                (
                    gen.randint(1, _MP, dtype=np.uint64),
                    gen.randint(0, _MP, dtype=np.uint64),
                )
                for _ in range(num_perm)
            ],
            dtype=np.uint64,
        ).T
        self.a, self.b = perms[0], perms[1]
        self.hashvalues = np.full(num_perm, _MAXH, dtype=np.uint64)

    def update(self, data: bytes):
        hv = np.uint64(struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0])
        phv = np.bitwise_and(
            (self.a * hv + self.b) % np.uint64(_MP), np.uint64(_MAXH)
        )
        self.hashvalues = np.minimum(phv, self.hashvalues)

    def jaccard(self, other):
        return float(np.count_nonzero(self.hashvalues == other.hashvalues)) / float(
            len(self.hashvalues)
        )


def minhash_ref(shingles: list[int], num_perm=64, seed=42) -> np.ndarray:
    """minhash_processor.py:10-16 call pattern."""
    mh = MinHashRef(num_perm=num_perm, seed=seed)
    if not shingles:
        mh.update(b"empty_document")
    else:
        for s in shingles:
            mh.update(str(s).encode("utf-8"))
    return mh.hashvalues


def candidate_pairs_ref(sigs: list[np.ndarray], b: int, r: int) -> set[tuple[int, int]]:
    """All (i<j) pairs sharing at least one of the first b*r-value bands —
    the uncapped semantics of datasketch MinHashLSH insert+query as driven
    by cluster_in_mem.py:170-203."""
    buckets: dict = {}
    for i, sig in enumerate(sigs):
        for bi in range(b):
            key = (bi, tuple(int(x) for x in sig[bi * r : (bi + 1) * r]))
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))
    return pairs


def cap_pairs_ref(pairs: set[tuple[int, int]], max_candidates: int) -> set[tuple[int, int]]:
    """Independent twin of cap_pairs_per_doc's DOCUMENTED semantics
    (deterministic reformulation of cluster_in_mem.py:165,186-187): each
    doc keeps its max_candidates smallest partners by id; a pair survives
    if either endpoint keeps it.  Brute-force per-doc dict/sort
    implementation, no Spark."""
    partners: dict[int, list[int]] = {}
    for a, b in pairs:
        partners.setdefault(a, []).append(b)
        partners.setdefault(b, []).append(a)
    kept = set()
    for d, ps in partners.items():
        for p in sorted(ps)[:max_candidates]:
            kept.add((min(d, p), max(d, p)))
    return kept


class UnionFindRef:
    def __init__(self, n):
        self.parent = list(range(n))
        self.rank = [0] * n

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if self.rank[rx] < self.rank[ry]:
            self.parent[rx] = ry
        elif self.rank[rx] > self.rank[ry]:
            self.parent[ry] = rx
        else:
            self.parent[ry] = rx
            self.rank[rx] += 1

    def assignments(self):
        """union_find.py:25-33 — dense ids in first-seen doc order."""
        clusters, cmap, idx = {}, {}, 0
        for d in range(len(self.parent)):
            root = self.find(d)
            if root not in cmap:
                cmap[root] = idx
                idx += 1
            clusters[d] = cmap[root]
        return clusters


def optimal_param_ref(threshold, num_perm, fpw=0.5, fnw=0.5):
    """Published datasketch _optimal_param (midpoint integration at 0.001)."""

    def integ(f, lo, hi):
        p = 0.001
        area, x = 0.0, lo
        while x < hi:
            area += f(x + 0.5 * p) * p
            x += p
        return area

    best, opt = float("inf"), (0, 0)
    for b in range(1, num_perm + 1):
        for r in range(1, num_perm // b + 1):
            fp = integ(lambda s: 1 - (1 - s ** float(r)) ** float(b), 0.0, threshold)
            fn = integ(
                lambda s: 1 - (1 - (1 - s ** float(r)) ** float(b)), threshold, 1.0
            )
            err = fp * fpw + fn * fnw
            if err < best:
                best, opt = err, (b, r)
    return opt


def cluster_ref(texts, threshold=0.3, shingle_size=6, num_perm=64, seed=42,
                preprocess_options=None):
    """End-to-end reference pipeline on a list of texts.

    Returns (assignments dict doc_id->cluster_id, edges set of
    (src, dst, sim) with src<dst, certainty dict doc_id->float).
    """
    clean = [preprocess_text_ref(t, preprocess_options) for t in texts]
    sigs = [minhash_ref(shingles_ref(c, shingle_size), num_perm, seed) for c in clean]
    b, r = optimal_param_ref(threshold, num_perm)
    cands = candidate_pairs_ref(sigs, b, r)
    edges = set()
    simd = {}
    for i, j in cands:
        sim = float(np.count_nonzero(sigs[i] == sigs[j])) / float(num_perm)
        if sim >= threshold:
            edges.add((i, j, sim))
            simd[(i, j)] = sim
    uf = UnionFindRef(len(texts))
    for i, j, _ in edges:
        uf.union(i, j)
    assign = uf.assignments()
    # certainty: cluster_in_mem.py:375-393
    by_cluster: dict = {}
    for d, c in assign.items():
        by_cluster.setdefault(c, []).append(d)
    certainty = {}
    for d, c in assign.items():
        members = [m for m in by_cluster[c] if m != d]
        if not members:
            certainty[d] = 1.0
            continue
        tot, cnt = 0.0, 0
        for m in members:
            pair = (d, m) if d < m else (m, d)
            if pair in simd:
                tot += simd[pair]
                cnt += 1
        certainty[d] = tot / cnt if cnt > 0 else 0.5
    return assign, edges, certainty
