"""Stage-isolated flagship measurement (guide §1.4 noop-sink protocol).

NOT the driver bench (bench.py is frozen); this file exists to attribute
flagship time to pipeline stages so optimization targets the real cost.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--passes N]

Each stage is materialized via localCheckpoint (eager) before the next is
timed, so a stage's number is ITS cost, not its ancestors'.  A small
warmup run at sf0.01 absorbs JVM/Arrow/Python-worker bring-up first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(sys.argv[sys.argv.index("--passes") + 1]) if "--passes" in sys.argv else 1

    from sparkdedup.config import DedupConfig
    from sparkdedup.pipeline import DedupPipeline, build_spark

    spark = build_spark(
        app="sparkdedup-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warmup: full flagship at sf0.01 (absorbs JVM JIT / worker spawn)
    wp = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6))
    wdocs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    noop(wp.run(wdocs)["assignments"])
    spark.catalog.clearCache()

    for pno in range(passes):
        spark.catalog.clearCache()
        t: dict[str, float] = {}
        pipe = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6))
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

        def timed(name, thunk):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            out = thunk()
            t[name] = round(time.time() - t0, 3)
            sc.setJobDescription(None)
            return out

        # 1. scan + preprocess UDF
        clean = timed(
            "01_normalize",
            lambda: pipe.normalize(docs, "text", "doc_id").localCheckpoint(eager=True),
        )
        # 2. minhash signature kernel
        sigs = timed(
            "02_signatures",
            lambda: pipe.signatures(clean).localCheckpoint(eager=True),
        )
        # 3+4. candidate generation + verify, measured along the path the
        # pipeline actually takes (round 6): fused kernel under the
        # broadcast strategy, staged pairs -> verify_pairs otherwise
        strategy = pipe.verify_strategy(sigs)
        if strategy == "broadcast":
            t["03_pairs"] = 0.0  # no materialized pair stage on this path
            edges = timed(
                "04_fused_pairs_verify",
                lambda: pipe._fused_edges(sigs).localCheckpoint(eager=True),
            )
            counts_pairs = None
        else:
            from sparkdedup.operators.verify import verify_pairs

            pairs = timed(
                "03_pairs", lambda: pipe.pairs(sigs).localCheckpoint(eager=True)
            )
            counts_pairs = pairs.count()
            edges = timed(
                "04_verify",
                lambda: verify_pairs(
                    pairs, sigs, pipe.config.threshold, pipe.config.num_perm,
                    strategy=strategy,
                ).localCheckpoint(eager=True),
            )
        # 5. connected components loop
        from sparkdedup.operators.connected_components import (
            assignments_from_components,
            connected_components,
        )

        star = timed(
            "05_cc", lambda: connected_components(edges).localCheckpoint(eager=True)
        )
        # 6. assignments + certainty
        from sparkdedup.operators.certainty import with_certainty

        def _final():
            assign = assignments_from_components(
                clean.select("doc_id"), star, dense=False
            )
            fin = with_certainty(assign, edges).select(
                "doc_id", "cluster_id", F.round("certainty", 6).alias("certainty")
            )
            noop(fin)
            return fin

        timed("06_assign_certainty", _final)

        # end-to-end flagship for cross-check (fresh pipeline, like bench.py)
        spark.catalog.clearCache()
        pipe2 = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6))

        def _full():
            out = pipe2.run(docs)["assignments"].select(
                "doc_id", "cluster_id", F.round("certainty", 6).alias("certainty")
            )
            noop(out)

        timed("full_run", _full)

        counts = {
            "clean": clean.count(),
            "pairs": counts_pairs,
            "edges": edges.count(),
        }
        print(
            json.dumps(
                {
                    "pass": pno,
                    "sf_dir": sf_dir,
                    "stages": t,
                    "stage_sum": round(
                        sum(v for k, v in t.items() if k != "full_run"), 3
                    ),
                    "counts": counts,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
