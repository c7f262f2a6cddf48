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

Usage: python tools/kernel_scaling.py [n_docs]   (default 60000)
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

    pdf = pd.read_parquet(os.path.join(ROOT, ".benchdata", "webtext_bench.parquet"),
                          columns=["text"]).head(N_DOCS)
    texts = pdf["text"].astype(str).tolist()

    results = {}
    for procs in (1, 8, 32):
        chunks = [texts[i::procs] for i in range(procs)]
        # warm pass: fault in every worker's pages outside the window
        with mp.get_context("spawn").Pool(procs) as pool:
            pool.map(_work, [c[:200] for c in chunks])
            t0 = time.time()
            pool.map(_work, chunks)
            wall = time.time() - t0
        results[procs] = {
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(N_DOCS / wall, 1),
        }
        print(json.dumps({"procs": procs, **results[procs]}), flush=True)
    eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
    out = {
        "n_docs": N_DOCS,
        "per_procs": results,
        "efficiency_8_to_32": round(eff, 3),
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "kernel_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
