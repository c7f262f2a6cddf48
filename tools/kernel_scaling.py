"""Kernel-level parallel-scaling anchor: the MinHash signature kernel (the
pipeline's dominant compute) run under plain multiprocessing at 1/8/32
workers on identical input.

Why this exists: the shared sandbox host shows up to 4x run-to-run wall
variance for full Spark jobs (BENCH/BASELINE.md caveats), which can swamp
the 8-vs-32 comparison.  This harness removes Spark, shuffles and the JVM
from the equation: if the kernel scales near-linearly here, residual
inefficiency in the Spark numbers is attributable to runtime/host effects
(GC, page-fault serialization, one shared memory bus), not to the
engine's parallel decomposition.

Usage: python tools/kernel_scaling.py [n_docs] [procs_csv]
       (defaults: 60000 docs, levels 1,8,32; pass e.g. "8,32" to skip the
       single-process level at sizes where it takes tens of minutes)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
LEVELS = tuple(
    int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ("1", "8", "32"))
)
SHINGLE, NUM_PERM, SEED = 6, 64, 42


def _work(texts: list[str]) -> int:
    from sparkdedup.minhash import cached_permutations, shingle_hash32, signature_from_hashes

    a, b = cached_permutations(NUM_PERM, SEED)
    cache: dict = {}
    acc = 0
    for t in texts:
        sig = signature_from_hashes(shingle_hash32(t, SHINGLE, cache), a, b)
        acc ^= int(sig[0])
    return acc


def main() -> None:
    import pandas as pd

    # prefer a same-size fixture (scale_bench writes webtext_bench_<n>)
    sized = os.path.join(ROOT, ".benchdata", f"webtext_bench_{N_DOCS}.parquet")
    src = sized if os.path.exists(sized) else os.path.join(
        ROOT, ".benchdata", "webtext_bench.parquet"
    )
    pdf = pd.read_parquet(src, columns=["text"]).head(N_DOCS)
    texts = pdf["text"].astype(str).tolist()

    results = {}
    for procs in LEVELS:
        chunks = [texts[i::procs] for i in range(procs)]
        # small warm pass: fault in every worker's code/numpy pages
        # outside the window; the FULL working set (gram caches, per-doc
        # buffers) still faults during pass 1 — that is the cold number.
        # Pass 2 reuses the faulted pools: the WARM (steady-state) host
        # ceiling, the anchor matching scale_bench's warm measurement.
        with mp.get_context("spawn").Pool(procs) as pool:
            pool.map(_work, [c[:200] for c in chunks])
            t0 = time.time()
            pool.map(_work, chunks)
            wall = time.time() - t0
            t0 = time.time()
            pool.map(_work, chunks)
            warm_wall = time.time() - t0
        results[procs] = {
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(len(texts) / wall, 1),
            "warm_wall_sec": round(warm_wall, 2),
            "warm_docs_per_sec": round(len(texts) / warm_wall, 1),
        }
        print(json.dumps({"procs": procs, **results[procs]}), flush=True)
    # label and file-key by the MEASURED size: head() clips to the
    # fixture's row count, and a mislabeled anchor would let scale_bench
    # publish a wrong same-size-comparison claim (review r04)
    n_actual = len(texts)
    if n_actual != N_DOCS:
        print(json.dumps({"warning": f"requested {N_DOCS} docs, fixture has {n_actual}"}))
    out = {"n_docs": n_actual, "requested_docs": N_DOCS, "per_procs": results}
    if 8 in results and 32 in results:
        eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
        out["efficiency_8_to_32"] = round(eff, 3)
        eff_w = (
            results[32]["warm_docs_per_sec"] / results[8]["warm_docs_per_sec"]
        ) / 4.0
        out["efficiency_8_to_32_warm"] = round(eff_w, 3)
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    # per-size artifact; the unsized name stays the original 60k anchor
    name = (
        "kernel_scaling.json" if n_actual == 60000 else f"kernel_scaling_{n_actual}.json"
    )
    with open(os.path.join(ROOT, "BENCH", name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
