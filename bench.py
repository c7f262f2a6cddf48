"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The flagship measurement is the end-to-end MinHash dedup pipeline over the
`documents` table (reference protocol config threshold=0.3, shingle_size=6,
num_perm=64, seed=42); docs/sec is reported alongside per the BASELINE.md
throughput definition.  Scaling-efficiency evidence (local[8] vs local[32])
lives in scale_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sparkdedup.pipeline import build_spark

    import __spark_entry__ as entry_mod

    spark = build_spark(
        app="sparkdedup-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entry_mod.queries()
    # Ordered cheap-first: the first queries absorb the one-time session
    # cold start (JVM JIT, Python worker spawn, Arrow init — ~30-60 s at
    # local[32]) so each later per-query wall time measures the query, not
    # the runtime bring-up.  The single-process oracle baseline
    # (BENCH/BASELINE.md) pays no such start either, so warm-measured
    # queries are the apples-to-apples comparison.
    headline = [
        "q1_pricing_summary",
        "j2_result_enrichment",
        "t2_topk_per_group",
        "text_token_count",
        "a10_degree_stats",
        "sim_cosine_topk",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_simhash_candidates",
        "dedup_minhash_assignments",  # flagship end-to-end pipeline
    ]

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # Two passes, per-query MIN: this box fault-in-s fresh memory at
    # ~6 MB/s until a process's page pool is warm (first-touch page
    # faults, host-backed lazy memory), which makes single-shot walls vary
    # up to 4x run-to-run.  The min across passes measures the engine, not
    # the VM's memory warm-up; raw passes are reported for transparency.
    passes: list[dict[str, float]] = []
    for i in range(2):
        if i:
            # fresh compute each pass: pipeline-internal persists would
            # otherwise serve pass 2 from cache and overstate the engine
            spark.catalog.clearCache()
        t: dict[str, float] = {}
        for name in headline:
            t0 = time.time()
            df = all_queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t[name] = round(time.time() - t0, 3)
        passes.append(t)
    timings = {name: min(p[name] for p in passes) for name in headline}

    total = round(sum(timings.values()), 3)
    flagship = timings["dedup_minhash_assignments"]
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": int(cpus),
        "dedup_docs": n_docs,
        "dedup_docs_per_sec": round(n_docs / flagship, 1) if flagship > 0 else None,
        "passes": passes,
        # measurement protocol, stated in-band so cross-round comparisons
        # are honest: cheap-first ordering absorbs session cold start into
        # the early queries; per-query MIN of the raw passes (reported
        # above) counters this host's first-touch page-fault variance.
        # Round 1 used single-pass flagship-first; do not compare r1
        # totals to later rounds without reading the raw passes.
        "protocol": "2 passes, warm session, cheap-first order, per-query min",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
