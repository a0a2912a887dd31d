"""spark-submit entry point for the north-rule job: synthetic code
corpus → posting-list index build → batched BM25 top-k (the default
TAAT strategy; pass queries through InvertedIndex.topk_batch's
``strategy`` to exercise block-max WAND instead).

Run (the packaging the north_rule requires — no repo on the PYTHONPATH,
the library ships as a --py-files zip):

    zip -qr /tmp/wtf_spark.zip wikitfidf_spark -x '*__pycache__*'
    spark-submit --master local[N] --py-files /tmp/wtf_spark.zip \
        tools/submit_job.py --docs 20000 --queries 100

Prints ONE JSON line on stdout with build/query wall times and
throughputs; bench_scaling.py runs it at two parallelism levels to
measure scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--index-dir", default=None)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument(
        "--reuse-index", action="store_true",
        help="serve from an existing --index-dir without rebuilding "
        "(query-only scaling reps: the build is the expensive part)",
    )
    ap.add_argument(
        "--query-reps", type=int, default=1,
        help="measured query-batch repetitions; the reported query_sec "
        "is the best (min) rep — filters shared-host noise",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from wikitfidf_spark.corpus import make_code_files, bench_query_mix
    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex

    spark = SparkSession.builder.getOrCreate()
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    idx_dir = args.index_dir or f"/tmp/wtf_submit_idx_{cores}c_{args.docs}d"
    if args.reuse_index:
        import os

        if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
            print(f"--reuse-index: no index at {idx_dir}", file=sys.stderr)
            sys.exit(2)
        build_sec = 0.0
    else:
        shutil.rmtree(idx_dir, ignore_errors=True)

        corpus = make_code_files(spark, n_docs=args.docs, seed=42).cache()
        corpus.count()  # materialize outside the timed build

        t0 = time.time()
        build_index(spark, corpus, idx_dir,
                    IndexConfig(n_shards=args.shards or cores, n_salts=8), resume=False)
        build_sec = time.time() - t0

    idx = InvertedIndex(spark, idx_dir)
    queries = bench_query_mix(args.queries)
    idx.topk_batch(queries[:4]).count()  # warm-up: JIT + parquet footers
    query_sec, n_rows = float("inf"), 0
    for _ in range(max(1, args.query_reps)):
        t0 = time.time()
        n_rows = idx.topk_batch(queries).count()
        query_sec = min(query_sec, time.time() - t0)

    from wikitfidf_spark.index.build import load_manifest

    phase_walls = {
        k: round(v["wall_sec"], 4)
        for k, v in load_manifest(idx_dir)["phases"].items()
    }

    n_postings = int(load_manifest(idx_dir)["metrics"]["n_postings"])
    print(json.dumps({
        "cores": cores,
        "n_docs": args.docs,
        "build_sec": round(build_sec, 3),
        "phases": phase_walls,
        "postings": n_postings,
        "postings_per_sec": round(n_postings / build_sec, 1) if build_sec else None,
        "n_queries": args.queries,
        "query_sec": round(query_sec, 3),
        "qps": round(args.queries / query_sec, 2),
        "result_rows": n_rows,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
