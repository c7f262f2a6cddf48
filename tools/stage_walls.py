"""Per-stage wall-time attribution for the scaling investigation (verdict
r2 item 3): run the flagship pipeline stage by stage with eager
materialization at exactly the boundaries DedupPipeline.run() cuts at, and
print each stage's wall — at one parallelism level per invocation so two
runs give the stage-level scaling picture.

Usage: python tools/stage_walls.py CPUS [N_ROWS]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".benchdata", "webtext_bench.parquet")


def main(cpus: int, n_rows: int | None) -> None:
    from sparkdedup.config import DedupConfig
    from sparkdedup.operators.certainty import with_certainty
    from sparkdedup.operators.connected_components import (
        assignments_from_components,
        connected_components,
    )
    from sparkdedup.operators.verify import verify_pairs
    from sparkdedup.pipeline import DedupPipeline, build_spark

    spark = build_spark(
        app=f"stage-walls-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2, driver_mem="16g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DATA)
    if n_rows:
        docs = docs.where(f"doc_id < {n_rows}")
    cfg = DedupConfig(
        threshold=0.3, shingle_size=6, exact_dedup_prepass=True,
        band_salt_threshold=500, band_drop_threshold=1000,
    )
    pipe = DedupPipeline(spark, cfg)
    # warmup (same as scale_bench)
    pipe_w = DedupPipeline(spark, cfg)
    pipe_w.run(docs.limit(2000), text_col="text", id_col="doc_id")[
        "assignments"
    ].write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    walls = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        walls[name] = round(time.time() - t0, 2)
        print(json.dumps({"stage": name, "wall": walls[name]}), flush=True)
        return out

    from pyspark.sql import functions as F

    clean = timed(
        "01_normalize",
        lambda: pipe.normalize(docs, "text", "doc_id").localCheckpoint(eager=True),
    )

    def _exact():
        hashed = clean.select("doc_id", F.md5("clean").alias("_h"))
        reps_by_hash = hashed.groupBy("_h").agg(F.min("doc_id").alias("rep"))
        return hashed.join(reps_by_hash, "_h").select("rep", "doc_id")

    groups = timed("02_exact_groups", lambda: _exact().localCheckpoint(eager=True))
    reps = clean.join(
        groups.where(F.col("doc_id") == F.col("rep")).select("doc_id"), "doc_id"
    )
    sigs = timed(
        "03_signatures", lambda: pipe.signatures(reps).localCheckpoint(eager=True)
    )
    pairs = timed("05_pairs", lambda: pipe.pairs(sigs).localCheckpoint(eager=True))
    edges = timed(
        "06_edges",
        lambda: verify_pairs(pairs, sigs, cfg.threshold, cfg.num_perm).localCheckpoint(
            eager=True
        ),
    )
    dup_edges = (
        groups.where(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("doc_id").alias("dst"))
        .withColumn("sim", F.lit(1.0))
    )
    all_edges = timed(
        "06b_union_dup_edges",
        lambda: edges.unionByName(dup_edges).localCheckpoint(eager=True),
    )
    star = timed("07_connected_components", lambda: connected_components(all_edges))
    assignments = timed(
        "08_assignments",
        lambda: assignments_from_components(
            clean.select("doc_id"), star
        ).localCheckpoint(eager=True),
    )
    timed(
        "09_certainty",
        lambda: with_certainty(assignments, all_edges)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    total = round(sum(walls.values()), 2)
    print(json.dumps({"cpus": cpus, "total": total, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else None)
