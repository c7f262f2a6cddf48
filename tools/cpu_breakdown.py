"""Where does the CPU go at each parallelism level?  Runs the flagship
pipeline once at local[CPUS] and, before stopping the session, walks
/proc to attribute cumulative user/system CPU seconds to (a) the JVM,
(b) the pyspark python workers, (c) this driver python — separating
engine work (user) from kernel overhead (page faults, memory compaction —
system).  Explains wall-vs-CPU anomalies in BENCH/BASELINE.md runs.

Usage: python tools/cpu_breakdown.py CPUS [N_ROWS]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".benchdata", "webtext_bench.parquet")
HZ = os.sysconf("SC_CLK_TCK")


def _proc_tree() -> dict[int, tuple[int, str, float, float]]:
    """pid -> (ppid, comm, user_sec, sys_sec) for all processes."""
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
            comm = raw[raw.index("(") + 1 : raw.rindex(")")]
            parts = raw[raw.rindex(")") + 2 :].split()
            out[int(d)] = (int(parts[1]), comm, int(parts[11]) / HZ, int(parts[12]) / HZ)
        except (OSError, ValueError, IndexError):
            continue
    return out


def _attribute(root_pid: int) -> dict[str, dict[str, float]]:
    procs = _proc_tree()
    children: dict[int, list[int]] = {}
    for pid, (ppid, *_rest) in procs.items():
        children.setdefault(ppid, []).append(pid)
    agg = {"jvm": [0.0, 0.0], "py_workers": [0.0, 0.0], "driver_py": [0.0, 0.0]}
    stack = [root_pid]
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        _ppid, comm, u, s = procs[p]
        if comm == "java":
            key = "jvm"
        elif p == root_pid:
            key = "driver_py"
        else:
            key = "py_workers"
        agg[key][0] += u
        agg[key][1] += s
        stack.extend(children.get(p, []))
    return {k: {"user_sec": round(v[0], 1), "sys_sec": round(v[1], 1)} for k, v in agg.items()}


def main(cpus: int, n_rows: int | None) -> None:
    from sparkdedup.config import DedupConfig
    from sparkdedup.pipeline import DedupPipeline, build_spark

    spark = build_spark(
        app=f"cpu-breakdown-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2, driver_mem="16g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DATA)
    if n_rows:
        docs = docs.where(f"doc_id < {n_rows}")
    cfg = DedupConfig(threshold=0.3, shingle_size=6, exact_dedup_prepass=True,
                      band_salt_threshold=500, band_drop_threshold=1000)
    DedupPipeline(spark, cfg).run(docs.limit(2000), text_col="text", id_col="doc_id")[
        "assignments"
    ].write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    base = _attribute(os.getpid())
    t0 = time.time()
    out = DedupPipeline(spark, cfg).run(docs, text_col="text", id_col="doc_id")
    n = out["assignments"].count()
    out["edges"].count()
    wall = time.time() - t0
    after = _attribute(os.getpid())
    delta = {
        k: {
            m: round(after[k][m] - base[k][m], 1) for m in ("user_sec", "sys_sec")
        }
        for k in after
    }
    # GC time from the JVM's GC MXBean via py4j (cumulative ms)
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        gc_ms = None
    print(json.dumps({
        "cpus": cpus, "docs": n, "wall_sec": round(wall, 2),
        "cpu_breakdown": delta,
        "jvm_gc_sec_cumulative": None if gc_ms is None else round(gc_ms / 1000.0, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else None)
