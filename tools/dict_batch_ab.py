import os, sys, time, json, statistics as st
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from wikitfidf_spark.session import get_spark
from wikitfidf_spark.corpus import make_code_files
from wikitfidf_spark.index.build import build_index, IndexConfig
from wikitfidf_spark.index.query import InvertedIndex

spark = get_spark(master="local[32]")
docs = make_code_files(spark, n_docs=20000)
idx_dir = "/tmp/dict_ab_idx"
import shutil, os
shutil.rmtree(idx_dir, ignore_errors=True)
build_index(spark, docs, idx_dir, IndexConfig(n_shards=32))
idx = InvertedIndex(spark, idx_dir)
vocab = [r["term"] for r in idx.dictionary.orderBy("df", ascending=False).limit(200).collect()]

def percall(n):
    for t in vocab[:n//2]:
        idx.prefix_terms(t[:3], 10).count()
    for t in vocab[n//2:n]:
        idx.suggest(t, max_dist=1, n=10).count()

def batch(n):
    idx.prefix_terms_batch([(i, t[:3]) for i, t in enumerate(vocab[:n//2])], n=10).count()
    idx.suggest_batch([(i, t) for i, t in enumerate(vocab[n//2:n])], max_dist=1, n=10).count()

out = {}
for n in (10, 50):
    percall(n); batch(n)  # warm-up, discarded
    a, b = [], []
    for _ in range(3):
        t0 = time.time(); percall(n); a.append(time.time() - t0)
        t0 = time.time(); batch(n);  b.append(time.time() - t0)
    out[f"panels_{n}"] = {
        "percall_med_sec": round(st.median(a), 3), "batch_med_sec": round(st.median(b), 3),
        "percall_runs": [round(x,3) for x in a], "batch_runs": [round(x,3) for x in b],
        "speedup": round(st.median(a)/st.median(b), 2),
    }
print(json.dumps(out))
spark.stop()
