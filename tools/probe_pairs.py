"""One-off probe: pairs-stage sub-step costs at sf1.0.

Sub-steps (results -> /tmp/probe_pairs.txt):
  S1. bands explode + band-size window + >=2 filter (materialize)
  S2. salt cells + replication + groupBy collect_list members (materialize)
  S3. HOF pair explode, pre-distinct (noop) + count
  S4. HOF pair explode + distinct (noop)
  S5. numpy mapInArrow pair explode, pre-distinct (noop)
  S6. fused numpy pairgen+verify from members + distinct on survivors (noop)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparkdedup.config import DedupConfig  # noqa: E402
from sparkdedup.operators.bands import explode_bands  # noqa: E402
from sparkdedup.operators.verify import _broadcast_signatures  # noqa: E402
from sparkdedup.pipeline import DedupPipeline, build_spark  # noqa: E402

OUT = open("/tmp/probe_pairs.txt", "a")


def log(msg):
    OUT.write(msg + "\n")
    OUT.flush()


sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = build_spark(app="probe-pairs", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

pipe = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6))
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
t0 = time.time()
clean = pipe.normalize(docs, "text", "doc_id").localCheckpoint(eager=True)
sigs = pipe.signatures(clean).localCheckpoint(eager=True)
log(f"setup: {time.time() - t0:.1f}s")


def t(name, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    log(f"{name}: {time.time() - t0:.2f}s")


SALT = 512
b, r = pipe.config.bands_rows()

# S1: sized bands
t0 = time.time()
bands = explode_bands(sigs, b, r)
w = Window.partitionBy("band_key")
sized = bands.withColumn("band_size", F.count(F.lit(1)).over(w)).where(
    F.col("band_size") >= 2
)
sized_cp = sized.localCheckpoint(eager=True)
log(f"S1_sized_bands: {time.time() - t0:.2f}s rows={sized_cp.count()}")

# S2: members
t0 = time.time()
cells = sized_cp.withColumn(
    "n_cells", F.ceil(F.col("band_size") / F.lit(SALT)).cast("int")
).withColumn("cell", F.pmod(F.xxhash64("doc_id"), F.col("n_cells")).cast("int"))
repl = cells.select(
    "band_key", "doc_id", "cell",
    F.explode(F.sequence(F.lit(0), F.col("n_cells") - 1)).alias("other"),
).select(
    "band_key", "doc_id", "cell",
    F.least("cell", "other").alias("ci"),
    F.greatest("cell", "other").alias("cj"),
)
members = repl.groupBy("band_key", "ci", "cj").agg(
    F.collect_list(F.struct(F.col("doc_id").alias("d"), F.col("cell").alias("c"))).alias("ms")
)
members_cp = members.localCheckpoint(eager=True)
log(f"S2_members: {time.time() - t0:.2f}s groups={members_cp.count()}")

# S3: HOF explode pre-distinct
pair_arr = F.expr(
    "flatten(transform(ms, (x, i) ->"
    " transform("
    "  filter(slice(ms, i + 2, size(ms) - i - 1),"
    "   y -> least(x.c, y.c) = ci AND greatest(x.c, y.c) = cj),"
    "  y -> struct(least(x.d, y.d) as lo, greatest(x.d, y.d) as hi))))"
)
hof_pairs = members_cp.select(F.explode(pair_arr).alias("p")).select(
    F.col("p.lo").alias("src"), F.col("p.hi").alias("dst")
)
t("S3_hof_explode_predistinct", hof_pairs)
log(f"S3_predistinct_count: {hof_pairs.count()}")

# S4: HOF explode + distinct
t("S4_hof_explode_distinct", hof_pairs.distinct())


# S5: numpy pair explode (pre-distinct)
def pairgen(batches):
    for batch in batches:
        ci = batch.column("ci").to_numpy()
        cj = batch.column("cj").to_numpy()
        ms = batch.column("ms")
        offs = ms.offsets.to_numpy()
        flat = ms.flatten()
        ds = np.asarray(flat.field("d"))
        cs = np.asarray(flat.field("c"))
        out_lo, out_hi = [], []
        for g in range(len(ci)):
            lo_, hi_ = offs[g], offs[g + 1]
            d = ds[lo_:hi_]
            c = cs[lo_:hi_]
            i, j = np.triu_indices(len(d), 1)
            if ci[g] != cj[g] or c.max(initial=0) > 0:
                cmin = np.minimum(c[i], c[j])
                cmax = np.maximum(c[i], c[j])
                keep = (cmin == ci[g]) & (cmax == cj[g])
                i, j = i[keep], j[keep]
            out_lo.append(np.minimum(d[i], d[j]))
            out_hi.append(np.maximum(d[i], d[j]))
        lo = np.concatenate(out_lo) if out_lo else np.empty(0, np.int64)
        hi = np.concatenate(out_hi) if out_hi else np.empty(0, np.int64)
        yield pa.RecordBatch.from_arrays([pa.array(lo), pa.array(hi)], ["src", "dst"])


np_pairs = members_cp.select("ci", "cj", "ms").mapInArrow(pairgen, "src long, dst long")
t("S5_numpy_pairgen_predistinct", np_pairs)
t("S5b_numpy_pairgen_distinct", np_pairs.distinct())

# S6: fused pairgen + verify
bc = _broadcast_signatures(sigs, "doc_id", "sig", 64)


def fused(batches):
    ids, mat = bc.value
    for batch in batches:
        ci = batch.column("ci").to_numpy()
        cj = batch.column("cj").to_numpy()
        ms = batch.column("ms")
        offs = ms.offsets.to_numpy()
        flat = ms.flatten()
        ds = np.asarray(flat.field("d"))
        cs = np.asarray(flat.field("c"))
        out_lo, out_hi, out_sim = [], [], []
        for g in range(len(ci)):
            lo_, hi_ = offs[g], offs[g + 1]
            d = ds[lo_:hi_]
            c = cs[lo_:hi_]
            i, j = np.triu_indices(len(d), 1)
            if ci[g] != cj[g] or c.max(initial=0) > 0:
                cmin = np.minimum(c[i], c[j])
                cmax = np.maximum(c[i], c[j])
                keep = (cmin == ci[g]) & (cmax == cj[g])
                i, j = i[keep], j[keep]
            rows = np.searchsorted(ids, d)
            sg = mat[rows]
            sim = (sg[i] == sg[j]).sum(axis=1) / 64.0
            keep2 = sim >= 0.3
            i, j, sim = i[keep2], j[keep2], sim[keep2]
            out_lo.append(np.minimum(d[i], d[j]))
            out_hi.append(np.maximum(d[i], d[j]))
            out_sim.append(sim)
        lo = np.concatenate(out_lo) if out_lo else np.empty(0, np.int64)
        hi = np.concatenate(out_hi) if out_hi else np.empty(0, np.int64)
        sm = np.concatenate(out_sim) if out_sim else np.empty(0, np.float64)
        yield pa.RecordBatch.from_arrays(
            [pa.array(lo), pa.array(hi), pa.array(sm)], ["src", "dst", "sim"]
        )


fused_edges = members_cp.select("ci", "cj", "ms").mapInArrow(
    fused, "src long, dst long, sim double"
).distinct()
t("S6_fused_pairverify_distinct", fused_edges)
t("S6b_fused_warm", fused_edges)

# parity vs committed path
from sparkdedup.operators.verify import verify_pairs  # noqa: E402

pairs_ref = pipe.pairs(sigs).localCheckpoint(eager=True)
edges_ref = verify_pairs(pairs_ref, sigs, 0.3, 64, strategy="broadcast")
ca = edges_ref.agg(F.count("*"), F.sum(F.hash("src", "dst", F.round("sim", 6)))).collect()[0]
cb = fused_edges.agg(F.count("*"), F.sum(F.hash("src", "dst", F.round("sim", 6)))).collect()[0]
cp = np_pairs.distinct().agg(F.count("*"), F.sum(F.hash("src", "dst"))).collect()[0]
cq = pairs_ref.agg(F.count("*"), F.sum(F.hash("src", "dst"))).collect()[0]
log(f"edges parity ref={tuple(ca)} fused={tuple(cb)} equal={tuple(ca) == tuple(cb)}")
log(f"pairs parity ref={tuple(cq)} numpy={tuple(cp)} equal={tuple(cq) == tuple(cp)}")
spark.stop()
log("done")
