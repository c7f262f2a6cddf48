import time, sys, os
sys.path.insert(0, '/root/repo')
CPUS = os.environ.get("P_CPUS", "8")
from sparkdedup.pipeline import build_spark, DedupPipeline
from sparkdedup.config import DedupConfig
from sparkdedup.operators.bands import explode_bands
from sparkdedup.operators.pairs import candidate_pairs
from sparkdedup.operators.verify import verify_pairs
from sparkdedup.operators.connected_components import connected_components, assignments_from_components
from sparkdedup.operators.certainty import with_certainty
from pyspark.sql import functions as F

spark = build_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)*2)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/repo/.benchdata/webtext_bench.parquet")
cfg = DedupConfig(threshold=0.3, shingle_size=6)
pipe = DedupPipeline(spark, cfg)

def tm(label, f):
    t0=time.time(); r = f(); print(label, round(time.time()-t0,2), flush=True); return r

clean = tm("normalize", lambda: pipe.normalize(docs,"text","doc_id").localCheckpoint(eager=True))
sigs = tm("signatures", lambda: pipe.signatures(clean).localCheckpoint(eager=True))
b,r_ = cfg.bands_rows()
bands = tm("bands", lambda: explode_bands(sigs,b,r_).localCheckpoint(eager=True))
print("band rows:", bands.count(), flush=True)
print("band max:", bands.groupBy("band_key").count().agg(F.max("count")).collect(), flush=True)
pairs = tm("pairs", lambda: candidate_pairs(bands, salt_threshold=2000).localCheckpoint(eager=True))
print("pairs:", pairs.count(), flush=True)
edges = tm("verify", lambda: verify_pairs(pairs, sigs, cfg.threshold, cfg.num_perm).localCheckpoint(eager=True))
print("edges:", edges.count(), flush=True)
star = tm("cc", lambda: connected_components(edges))
assign = tm("assign", lambda: assignments_from_components(clean.select("doc_id"), star, dense=False).localCheckpoint(eager=True))
fin = tm("certainty", lambda: with_certainty(assign, edges).localCheckpoint(eager=True))
print("docs:", fin.count(), flush=True)
