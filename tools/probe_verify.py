"""One-off probe: where does the verify stage's time actually go at sf1.0?

Variants over the same materialized pairs/sigs (results -> /tmp/probe_verify.txt):
  C. broadcast join, trivial projection (isolates join cost vs jaccard cost)
  A. broadcast join + unrolled 64-term jaccard (the JVM-expression path)
  N. numpy mapInArrow kernel over a python-broadcast signature matrix
  B. shuffle_hash join + unrolled jaccard (round-5 shape)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparkdedup.config import DedupConfig  # noqa: E402
from sparkdedup.operators.verify import verify_pairs  # noqa: E402
from sparkdedup.pipeline import DedupPipeline, build_spark  # noqa: E402

OUT = open("/tmp/probe_verify.txt", "a")


def log(msg):
    OUT.write(msg + "\n")
    OUT.flush()


sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = build_spark(app="probe-verify", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

pipe = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6))
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
t0 = time.time()
clean = pipe.normalize(docs, "text", "doc_id").localCheckpoint(eager=True)
sigs = pipe.signatures(clean).localCheckpoint(eager=True)
pairs = pipe.pairs(sigs).localCheckpoint(eager=True)
log(f"setup: {time.time() - t0:.1f}s")


def t(name, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    log(f"{name}: {time.time() - t0:.2f}s")


s1 = F.broadcast(sigs.select(F.col("doc_id").alias("src"), F.col("sig").alias("_sig_src")))
s2 = F.broadcast(sigs.select(F.col("doc_id").alias("dst"), F.col("sig").alias("_sig_dst")))
join_only = (
    pairs.join(s1, "src").join(s2, "dst")
    .select("src", "dst", (F.element_at("_sig_src", 1) + F.element_at("_sig_dst", 64)).alias("x"))
)
t("C_join_only_broadcast", join_only)
t("C2_join_only_broadcast_warm", join_only)

t("A_broadcast_unrolled", verify_pairs(pairs, sigs, 0.3, 64, strategy="broadcast"))

# N: numpy kernel
tb = time.time()
tbl = sigs.toArrow()
ids = tbl.column("doc_id").to_numpy()
mat = np.asarray(tbl.column("sig").combine_chunks().flatten()).reshape(len(ids), 64)
order = np.argsort(ids)
ids, mat = ids[order], np.ascontiguousarray(mat[order])
bc = spark.sparkContext.broadcast((ids, mat))
log(f"N_setup(collect+broadcast): {time.time() - tb:.2f}s")


def gen(batches):
    ids, mat = bc.value
    for b in batches:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        sim = (mat[si] == mat[di]).sum(axis=1) / 64.0
        keep = sim >= 0.3
        yield pa.RecordBatch.from_arrays(
            [pa.array(src[keep]), pa.array(dst[keep]), pa.array(sim[keep])],
            ["src", "dst", "sim"],
        )


narrow = pairs.select("src", "dst")
vn = narrow.mapInArrow(gen, "src long, dst long, sim double")
t("N_numpy_mapinarrow", vn)
t("N_numpy_mapinarrow_warm", vn)

t("B_shufflehash_unrolled", verify_pairs(pairs, sigs, 0.3, 64, strategy="shuffle_hash"))

# cross-check row counts + checksum parity between A and N
a = verify_pairs(pairs, sigs, 0.3, 64, strategy="broadcast")
ca = a.agg(F.count("*"), F.sum(F.hash("src", "dst", F.round("sim", 6)))).collect()[0]
cn = vn.agg(F.count("*"), F.sum(F.hash("src", "dst", F.round("sim", 6)))).collect()[0]
log(f"parity A={tuple(ca)} N={tuple(cn)} equal={tuple(ca) == tuple(cn)}")
spark.stop()
log("done")
