"""Measure the ANN multi-probe recall/cost curve on the sf0.1 embeddings
(2000 vectors) and write BENCH/ANN.md — the measured tradeoff the
``sparkdedup.ann.search`` docstring points at.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from pyspark.sql import functions as F

    from sparkdedup.ann import brute_force_topk, build_index, search
    from sparkdedup.pipeline import build_spark

    spark = build_spark(app="ann-recall", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vecs = e.count()
    n_bits, stride, dim, k, n_q = 6, 10, 64, 10, 50
    idx = build_index(e, n_bits=n_bits, dim_stride=stride, dim=dim).localCheckpoint(
        eager=True
    )
    qs = e.where(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(e, qs, k=k, dim=dim)
    truth: dict[int, set[int]] = {}
    t0 = time.time()
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    brute_wall = time.time() - t0
    total = sum(len(t) for t in truth.values())

    rows = []
    for probes in (0, 1, 2, 3):
        n_buckets = sum(math.comb(n_bits, d) for d in range(probes + 1))
        t0 = time.time()
        res = search(
            idx, qs, k=k, n_bits=n_bits, dim_stride=stride, probes=probes, dim=dim
        )
        got: dict[int, set[int]] = {}
        cand = 0
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
            cand += 1
        wall = time.time() - t0
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        rows.append(
            {
                "probes": probes,
                "buckets_probed": n_buckets,
                "bucket_frac": round(n_buckets / (1 << n_bits), 4),
                "recall_at_10": round(hits / total, 4),
                "wall_sec": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "ANN.md"), "w") as f:
        f.write(
            f"""# ANN multi-probe recall curve (sf0.1)

Sign-LSH index (n_bits={n_bits}, dim_stride={stride}) over {n_vecs:,}
64-dim embeddings; {n_q} batch queries, recall@{k} vs the exact
brute-force cosine baseline (which scored all pairs in {brute_wall:.2f}s).
Probing Hamming-distance<=p bucket neighborhoods trades candidate volume
for recall; p = n_bits probes every bucket and equals brute force exactly
(pinned by tests/test_ann.py::test_multiprobe_recall_curve).

| probes p | buckets probed | fraction of space | recall@{k} | wall (s) |
|---|---|---|---|---|
"""
            + "\n".join(
                f"| {r['probes']} | {r['buckets_probed']} | {r['bucket_frac']} |"
                f" {r['recall_at_10']} | {r['wall_sec']} |"
                for r in rows
            )
            + """

At 10^12 vectors the same plan shape holds: the index is a table
partitioned by bucket, the probe explode is a narrow 1->B expansion of the
(small) query side, and the bucket equi-join prunes partitions — recall is
tuned per query batch via `probes` with zero index rebuild.
"""
        )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
