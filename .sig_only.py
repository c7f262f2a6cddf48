import time, sys
sys.path.insert(0, '/root/repo')
from sparkdedup.pipeline import build_spark, DedupPipeline
from sparkdedup.config import DedupConfig
spark = build_spark(master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/repo/.benchdata/webtext_bench.parquet")
pipe = DedupPipeline(spark, DedupConfig())
clean = pipe.normalize(docs,"text","doc_id").localCheckpoint(eager=True)
print("clean parts:", clean.rdd.getNumPartitions(), flush=True)
t0=time.time()
sigs = pipe.signatures(clean)
print("sig parts:", sigs.rdd.getNumPartitions(), flush=True)
sigs.write.format("noop").mode("overwrite").save()
print("signatures", round(time.time()-t0,2), flush=True)
