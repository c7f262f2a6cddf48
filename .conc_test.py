import sys, time, os
sys.path.insert(0,'/root/repo')
import pandas as pd
from multiprocessing import Pool
pdf = pd.read_parquet('/root/repo/.benchdata/webtext_bench.parquet')
texts = pdf['text'].tolist()

def work(args):
    lo, n, cache_max = args
    import sparkdedup.functions.signatures as S
    from sparkdedup.minhash import cached_permutations, shingle_hash32, signature_from_hashes
    a, b = cached_permutations(64, 42)
    cache = {}
    t0 = time.time()
    for t in texts[lo:lo+n]:
        if len(cache) > cache_max: cache = {}
        signature_from_hashes(shingle_hash32(t, 6, cache), a, b)
    return n / (time.time()-t0)

for nproc in (1, 2, 4, 8, 16, 32):
    for cache_max in (100_000,):
        with Pool(nproc) as p:
            rates = p.map(work, [(i*4000, 4000, cache_max) for i in range(nproc)])
        print(f"nproc={nproc} cache={cache_max}: per-proc {sum(rates)/len(rates):.0f} docs/s, agg {sum(rates):.0f}", flush=True)
