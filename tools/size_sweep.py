"""Reference-protocol bench diagnostics (verdict r2 item 5): breaking-point
size sweep with a peak-RSS monitor and log-log power-law complexity fit —
the Spark-side analogue of the reference's benchmark_performance.py
protocol (sizes 1000*2^k, time & memory vs n, fitted exponents), run at
TWO parallelism levels.

Per size n and parallelism p: a fresh subprocess runs the full dedup
pipeline (scale config) on the first n rows of the deterministic bench
fixture; the harness samples the RSS of the whole process subtree (python
driver + JVM + python workers) at 2 Hz and records the peak.  After the
sweep, ordinary least squares on (log n, log wall) and (log n, log
peak_rss) gives the fitted exponents; results append durably to
BENCH/size_sweep.jsonl and the report goes to BENCH/size_sweep.md.

Usage:
    python tools/size_sweep.py                    # full sweep -> BENCH/
    python tools/size_sweep.py --worker N CPUS    # (internal) one run
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".benchdata", "webtext_bench.parquet")
SIZES = [1000 * (2 ** k) for k in range(8)]  # 1k .. 128k
LEVELS = (8, 32)


def worker(n_rows: int, cpus: int) -> None:
    from sparkdedup.config import DedupConfig
    from sparkdedup.pipeline import DedupPipeline, build_spark

    spark = build_spark(
        app=f"sweep-{n_rows}-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2, driver_mem="16g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DATA).where(f"doc_id < {n_rows}")
    cfg = DedupConfig(
        threshold=0.3, shingle_size=6, exact_dedup_prepass=True,
        band_salt_threshold=500, band_drop_threshold=1000,
    )
    # warmup outside the window (same rationale as scale_bench.py)
    DedupPipeline(spark, cfg).run(docs.limit(2000), text_col="text", id_col="doc_id")[
        "assignments"
    ].write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.time()
    out = DedupPipeline(spark, cfg).run(docs, text_col="text", id_col="doc_id")
    n_docs = out["assignments"].count()
    n_edges = out["edges"].count()
    wall = time.time() - t0
    print(json.dumps({
        "n": n_rows, "cpus": cpus, "wall_sec": round(wall, 2),
        "docs": n_docs, "edges": n_edges,
        "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


def _descendants(pid: int) -> set[int]:
    """All descendant pids of `pid` via /proc ppid chains (one scan)."""
    children: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().split(")")[-1].split()
            ppid = int(parts[1])
            children.setdefault(ppid, []).append(int(d))
        except (OSError, IndexError, ValueError):
            continue
    out: set[int] = set()
    stack = [pid]
    while stack:
        p = stack.pop()
        for c in children.get(p, []):
            if c not in out:
                out.add(c)
                stack.append(c)
    return out


def _tree_rss_kb(pid: int) -> int:
    total = 0
    for p in _descendants(pid) | {pid}:
        try:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total


class PeakRss(threading.Thread):
    def __init__(self, pid: int):
        super().__init__(daemon=True)
        self.pid = pid
        self.peak_kb = 0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            self.peak_kb = max(self.peak_kb, _tree_rss_kb(self.pid))
            self._stop.wait(0.5)

    def stop(self) -> int:
        self._stop.set()
        self.join(timeout=2)
        return self.peak_kb


def _one(n: int, cpus: int) -> dict:
    import subprocess

    proc = subprocess.Popen(
        [sys.executable, __file__, "--worker", str(n), str(cpus)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=ROOT,
    )
    mon = PeakRss(proc.pid)
    mon.start()
    stdout, _ = proc.communicate()
    peak = mon.stop()
    line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["peak_rss_mb"] = round(peak / 1024.0, 1)
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "size_sweep.jsonl"), "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **res}) + "\n")
    print(json.dumps(res), flush=True)
    return res


def _fit(xs: list[float], ys: list[float]) -> tuple[float, float]:
    """OLS slope+intercept of log y ~ log x -> (exponent, prefactor)."""
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    sxx = sum((a - mx) ** 2 for a in lx)
    sxy = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    slope = sxy / sxx
    return slope, math.exp(my - slope * mx)


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    from scale_bench import ensure_data

    ensure_data()
    results: dict[int, list[dict]] = {lv: [] for lv in LEVELS}
    for n in SIZES:
        for lv in LEVELS:
            results[lv].append(_one(n, lv))

    lines = [
        "# BENCH — size sweep + power-law complexity fit",
        "",
        "Reference bench protocol (benchmark_performance.py:175-190,302-330",
        "re-expressed for Spark): full dedup pipeline on the first n rows of",
        "the deterministic bench fixture, n = 1000*2^k; fresh JVM per run;",
        "peak RSS = max over 2 Hz samples of the WHOLE process subtree",
        "(driver + JVM + python workers).  Exponents from OLS on log-log.",
        "",
        "| n | cpus | wall (s) | docs/s | edges | peak RSS (MB) |",
        "|---|---|---|---|---|---|",
    ]
    for lv in LEVELS:
        for r in results[lv]:
            lines.append(
                f"| {r['n']:,} | {r['cpus']} | {r['wall_sec']} | "
                f"{r['docs_per_sec']} | {r['edges']:,} | {r['peak_rss_mb']} |"
            )
    lines.append("")
    lines.append("| cpus | time exponent (wall ~ n^a) | mem exponent (rss ~ n^b) |")
    lines.append("|---|---|---|")
    summary = {}
    for lv in LEVELS:
        ns = [r["n"] for r in results[lv]]
        ta, _ = _fit(ns, [r["wall_sec"] for r in results[lv]])
        ma, _ = _fit(ns, [r["peak_rss_mb"] for r in results[lv]])
        lines.append(f"| local[{lv}] | {ta:.3f} | {ma:.3f} |")
        summary[lv] = {"time_exp": round(ta, 3), "mem_exp": round(ma, 3)}
    lines.append("")
    lines.append(
        "A time exponent near 1.0 = linear scaling in corpus size (the LSH"
    )
    lines.append(
        "design goal — no quadratic candidate blowup); memory exponent < 1"
    )
    lines.append("means state grows sublinearly vs input (fixed JVM heap dominates).")
    with open(os.path.join(ROOT, "BENCH", "size_sweep.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
