"""One-off conf probe for the 128k-256k 8-vs-32 crossover (VERDICT r03
item 2): run the flagship pipeline at a given size/parallelism with conf
overrides, fresh JVM per run, warmup outside the window — so candidate
footprint-shrinking knobs (smaller Arrow batches, smaller heap, fewer
shuffle partitions) can be compared on equal terms.

Usage:
    python tools/conf_probe.py CPUS N_ROWS [key=val ...]
Conf keys: arrow=<maxRecordsPerBatch>  mem=<driver_mem>  parts=<shuffle>
Prints ONE JSON line with wall/docs_per_sec + the overrides used.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".benchdata", "webtext_bench.parquet")


def main() -> None:
    cpus = int(sys.argv[1])
    n_rows = int(sys.argv[2])
    opts = dict(kv.split("=", 1) for kv in sys.argv[3:])
    arrow = int(opts.get("arrow", 10000))
    mem = opts.get("mem", "16g")
    parts = int(opts.get("parts", cpus * 2))

    from pyspark.sql import SparkSession

    from sparkdedup.config import DedupConfig
    from sparkdedup.pipeline import DedupPipeline

    spark = (
        SparkSession.builder.appName(f"conf-probe-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DATA).where(f"doc_id < {n_rows}")
    cfg = DedupConfig(threshold=0.3, shingle_size=6, exact_dedup_prepass=True,
                      band_salt_threshold=500, band_drop_threshold=1000)
    # warmup outside the window (same rationale as scale_bench.worker)
    DedupPipeline(spark, cfg).run(docs.limit(4000), text_col="text", id_col="doc_id")[
        "assignments"
    ].write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.time()
    out = DedupPipeline(spark, cfg).run(docs, text_col="text", id_col="doc_id")
    n = out["assignments"].count()
    e = out["edges"].count()
    wall = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "n_rows": n_rows, "arrow": arrow, "mem": mem, "parts": parts,
        "wall_sec": round(wall, 2), "docs": n, "edges": e,
        "docs_per_sec": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
