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

HOST-HEALTH CAPTURE (VERDICT r03 item 1): the committed BENCH_r03.json was
recorded under host contention (flagship 53.9s vs 14.5s idle — a 3.9x
phantom "regression" in the cross-round ledger).  Every pass now records,
in-band: steal% over the pass window, whole-box CPU utilization, the CPU
burned by processes OUTSIDE this bench's own process tree ("other_cores",
from /proc deltas), and the loadavg captured BEFORE the session starts.
A pass is INVALID — rerun, never data — when steal% > 3, other_cores >
cpus/4, or its flagship wall disagrees with the best pass by > 2x; up to
2 extra passes are run to replace invalid ones, and the validity verdict
is printed with the numbers so a contaminated artifact can't masquerade
as a regression again.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sparkdedup.hosthealth import box_cpu as _box_cpu  # noqa: E402
from sparkdedup.hosthealth import tree_cpu as _tree_cpu  # noqa: E402


def _measure_pass(queries, headline, spark, sf_dir) -> dict:
    """One timed pass over the headline queries, with host-health fields."""
    b0, s0, t0 = _box_cpu()
    j0 = _tree_cpu()
    w0 = time.time()
    t: dict[str, float] = {}
    for name in headline:
        q0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t[name] = round(time.time() - q0, 3)
    w1 = time.time()
    b1, s1, t1 = _box_cpu()
    j1 = _tree_cpu()
    window = max(w1 - w0, 1e-9)
    other = max((b1 - b0) - (j1 - j0), 0.0)
    return {
        "queries": t,
        "wall_sec": round(window, 3),
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1e-9), 2),
        "cpu_util": round((b1 - b0) / window / os.cpu_count(), 3),
        "other_cores": round(other / window, 2),
    }


def _pass_invalid(p: dict) -> str | None:
    # threshold on the HOST core count (same basis as cpu_util), not the
    # Spark parallelism: SPARK_GRAFT_CPUS=8 on a 32-core box must not let
    # routine daemons spuriously invalidate passes (review r04)
    host_cores = os.cpu_count() or 1
    if p["steal_pct"] > 3.0:
        return f"steal_pct {p['steal_pct']} > 3"
    if p["other_cores"] > host_cores / 4:
        return f"other_cores {p['other_cores']} > {host_cores / 4} (concurrent host load)"
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # loadavg BEFORE the session exists = external load only
    load_before = os.getloadavg()

    from sparkdedup.pipeline import build_spark

    import __spark_entry__ as entry_mod

    spark = build_spark(
        app="sparkdedup-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
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
    flagship_q = "dedup_minhash_assignments"

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # Two valid passes, per-query MIN: this box faults in fresh memory at
    # ~6 MB/s until a process's page pool is warm (first-touch page
    # faults, host-backed lazy memory), which makes single-shot walls vary
    # up to 4x run-to-run.  The min across passes measures the engine, not
    # the VM's memory warm-up; raw passes are reported for transparency.
    passes: list[dict] = []
    invalid: list[dict] = []
    max_passes = 4  # 2 standard + up to 2 replacement reruns
    for i in range(max_passes):
        if i:
            # fresh compute each pass: pipeline-internal persists would
            # otherwise serve later passes from cache and overstate the engine
            spark.catalog.clearCache()
        p = _measure_pass(all_queries, headline, spark, sf_dir)
        reason = _pass_invalid(p)
        if reason is None:
            passes.append(p)
        else:
            invalid.append({**p, "invalid": reason})
        if len(passes) >= 2:
            # flagship cross-pass sanity: a pass >2x the best is the
            # VM's fault path or unseen contention, not the engine
            best = min(q["queries"][flagship_q] for q in passes)
            bad = [q for q in passes if q["queries"][flagship_q] > 2 * best]
            for q in bad:
                q2 = dict(q)
                q2["invalid"] = f"flagship {q['queries'][flagship_q]} > 2x best {best}"
                invalid.append(q2)
            passes = [q for q in passes if q not in bad]
        if len(passes) >= 2:
            break

    # all-invalid fallback: still print SOMETHING (the least-contended
    # pass) so the round has a number, but report it as a fallback —
    # never under valid_passes — and keep measurement_valid false so no
    # ledger can mistake it for data (review r04)
    fallback = None
    if passes:
        usable = passes
    else:
        fallback = min(invalid, key=lambda p: p["queries"][flagship_q])
        usable = [fallback]
    timings = {name: min(p["queries"][name] for p in usable) for name in headline}

    total = round(sum(timings.values()), 3)
    flagship = timings[flagship_q]
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "dedup_docs": n_docs,
        "dedup_docs_per_sec": round(n_docs / flagship, 1) if flagship > 0 else None,
        "passes": [p["queries"] for p in usable],
        "host_health": {
            "loadavg_before": [round(x, 2) for x in load_before],
            "valid_passes": [
                {k: v for k, v in p.items() if k != "queries"} for p in passes
            ],
            # invalid passes KEEP their per-query timings (ADVICE r04):
            # they are excluded from the headline numbers, but auditing WHY
            # a pass was 2x slower needs the per-query breakdown
            "invalid_passes": invalid,
            "fallback_pass": (
                {k: v for k, v in fallback.items() if k != "queries"}
                if fallback
                else None
            ),
            "measurement_valid": bool(passes) and len(passes) >= 2,
        },
        # measurement protocol, stated in-band so cross-round comparisons
        # are honest: cheap-first ordering absorbs session cold start into
        # the early queries; per-query MIN of the VALID passes counters
        # this host's first-touch page-fault variance; passes with steal%
        # > 3, concurrent-load CPU > cpus/4 cores, or a flagship > 2x the
        # best pass are excluded and reported under host_health.  Round 1
        # used single-pass flagship-first; round 3's committed artifact
        # was contention-contaminated (see BENCH/README.md).
        "protocol": (
            "2 valid passes (max 4), warm session, cheap-first order, "
            "per-query min; contended passes excluded via host_health"
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
