"""Generate expected-output fixture parquet for the non-SQL-expressible
driver queries (MinHash flagship + SimHash candidates), so ``oracle_sql``
becomes a trivial DuckDB ``read_parquet`` SELECT and the driver's
rows+schema+value-hash gate covers the engine core (the same pattern the
substring stage uses with its enumeration oracle).

The expected values come from INDEPENDENT implementations:

  * MinHash assignments/edges: ``tests/oracle.py`` — the pure-Python,
    row-at-a-time reimplementation of the reference algorithm
    (preprocess -> md5 shingles -> datasketch-semantics MinHash ->
    optimal-(b,r) banding -> signature Jaccard -> union-find), a code path
    sharing nothing with sparkdedup's vectorized kernels.
  * SimHash candidates: a from-the-spec scalar SimHash (md5 low-64 feature
    hash, unit weights with multiplicity, sign-of-vote bits) plus a
    brute-force ALL-PAIRS scan with a band-share condition — vs the Spark
    query's banded equi-join.

Run:  python tools/gen_expected_fixtures.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 -> fixtures/ (committed; ~25 KB total).
"""

from __future__ import annotations

import hashlib
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tests.oracle import cluster_ref  # noqa: E402

THRESHOLD = 0.3
SHINGLE = 6
PREPROCESS = {"lowercase": False, "remove_diacritics": False, "remove_punctuation": False}


def _round6(x: float) -> float:
    """Match Spark's round(col, 6): shortest-decimal repr, HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def minhash_fixtures(doc_ids: list[int], texts: list[str]):
    """-> (assignments rows, edges rows) with min-doc-id cluster labels
    (the pipeline's scale-safe default; dense ids only exist in parity
    tests)."""
    assign, edges, certainty = cluster_ref(
        texts, threshold=THRESHOLD, shingle_size=SHINGLE, preprocess_options=PREPROCESS
    )
    # oracle indices are positions in `texts`; map to real doc ids and
    # relabel each cluster with its min member doc_id
    by_cluster: dict[int, list[int]] = {}
    for pos, c in assign.items():
        by_cluster.setdefault(c, []).append(doc_ids[pos])
    label = {c: min(ms) for c, ms in by_cluster.items()}
    assignments = [
        (doc_ids[pos], label[c], _round6(certainty[pos])) for pos, c in assign.items()
    ]
    edge_rows = [
        (min(doc_ids[i], doc_ids[j]), max(doc_ids[i], doc_ids[j]), _round6(sim))
        for i, j, sim in edges
    ]
    return assignments, edge_rows


def simhash64(text: str, k: int = 6) -> int:
    """Scalar from-the-spec SimHash: md5-low-64 char k-gram features, unit
    weights with multiplicity, bit j set iff vote > 0; unsigned value."""
    if not text:
        grams = []
    elif len(text) < k:
        grams = [text]
    else:
        grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    if not grams:
        return int.from_bytes(hashlib.md5(b"empty_document").digest()[8:], "big")
    votes = [0] * 64
    for g in grams:
        h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:], "big")
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if votes[j] > 0:
            out |= 1 << j
    return out


def simhash_fixtures(doc_ids: list[int], texts: list[str], hamming_max: int = 16):
    """Brute-force all-pairs: emit (src, dst, hamming) for pairs sharing
    >= 1 of the four 16-bit bands with Hamming distance <= hamming_max —
    the semantics of __spark_entry__._dedup_simhash_candidates."""
    hs = [simhash64(t) for t in texts]
    rows = []
    n = len(texts)
    for i in range(n):
        for j in range(i + 1, n):
            if hs[i] == hs[j] or any(
                (hs[i] >> (16 * b)) & 0xFFFF == (hs[j] >> (16 * b)) & 0xFFFF
                for b in range(4)
            ):
                ham = bin(hs[i] ^ hs[j]).count("1")
                if ham <= hamming_max:
                    a, b2 = sorted((doc_ids[i], doc_ids[j]))
                    rows.append((a, b2, ham))
    return rows


def main(sf_dir: str = "/root/testdata/sf0.01", out_dir: str | None = None) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = out_dir or os.path.join(repo, "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs = docs[docs["text"].notna()].sort_values("doc_id")
    doc_ids = docs["doc_id"].astype(int).tolist()
    texts = docs["text"].astype(str).tolist()

    assignments, edge_rows = minhash_fixtures(doc_ids, texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in assignments], pa.int64()),
                "cluster_id": pa.array([r[1] for r in assignments], pa.int64()),
                "certainty": pa.array([r[2] for r in assignments], pa.float64()),
            }
        ),
        os.path.join(out_dir, "expected_minhash_assignments.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "src": pa.array([r[0] for r in edge_rows], pa.int64()),
                "dst": pa.array([r[1] for r in edge_rows], pa.int64()),
                "sim": pa.array([r[2] for r in edge_rows], pa.float64()),
            }
        ),
        os.path.join(out_dir, "expected_minhash_edges.parquet"),
    )

    sh_rows = simhash_fixtures(doc_ids, texts)
    pq.write_table(
        pa.table(
            {
                "src": pa.array([r[0] for r in sh_rows], pa.int64()),
                "dst": pa.array([r[1] for r in sh_rows], pa.int64()),
                "hamming": pa.array([r[2] for r in sh_rows], pa.int32()),
            }
        ),
        os.path.join(out_dir, "expected_simhash_candidates.parquet"),
    )
    print(
        f"wrote {len(assignments)} assignments, {len(edge_rows)} edges, "
        f"{len(sh_rows)} simhash candidates to {out_dir}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
