"""Dump .explain('formatted') for declared queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <outdir> [query ...]

With no query names, dumps every declared query.  The flagship pipeline
queries build their plan through run(), which materializes intermediate
stages eagerly — the dumped plan is the FINAL assignments/edges plan over
the localCheckpoint leaves, plus (separately) the un-cut verify join
plan, which is where the round-6 work landed.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry_mod
    from sparkdedup.pipeline import build_spark

    spark = build_spark(
        app="sparkdedup-plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if not names:
        names = list(queries)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", os.path.join(outdir, f"{name}.txt"), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
