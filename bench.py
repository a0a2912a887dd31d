"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf", ...}.

Beyond the sf-dir queries it measures the engine's north-rule metrics on
a deterministic synthetic code corpus (FIXTURES.md F1 bench scale):
index-build wall time (+ postings/sec, skew ratio) and batched BM25
top-k throughput (queries/sec; TAAT default strategy).  Scaling-efficiency
evidence (same job at two parallelism levels) lives in bench_scaling.py
→ BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def log(*a):  # keep stdout clean for the one JSON line
    print(*a, file=sys.stderr, flush=True)


def make_queries(n: int = 100) -> list:
    from wikitfidf_spark.corpus import bench_query_mix

    return bench_query_mix(n)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if cpus in ("*", ""):  # session.get_spark documents local[*] for this var
        cpus = str(os.cpu_count())
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or "0.1"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wikitfidf_spark.session import get_spark
    from wikitfidf_spark.corpus import make_code_files
    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex
    import __spark_entry__ as entry

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        log(f"{name}: {timings[name]}s")
        return out

    # ---- sf-dir headline queries (force execution via count/collect)
    HEADLINE = [
        "term_frequency", "global_term_stats", "tfidf_topn_per_doc",
        "bm25_or_topk", "bm25_and_topk", "minhash_candidates",
        "ann_cosine_topk", "token_counts", "events_windowed",
        "sessionize", "lineitem_pricing", "broadcast_join_agg",
    ]
    qmap = entry.queries()
    for name in HEADLINE:
        timed(name, lambda n=name: qmap[n](spark, sf_dir).count())

    # ---- north-rule metrics: index build + WAND q/s on the bench corpus
    idx_dir = f"/tmp/wikitfidf_bench_idx_{n_docs}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    corpus = make_code_files(spark, n_docs=n_docs, seed=42).cache()
    timed("bench_corpus_gen", corpus.count)  # count() materializes the cache
    cfg = IndexConfig(n_shards=int(cpus), n_salts=8)
    res = timed("index_build", lambda: build_index(spark, corpus, idx_dir, cfg, resume=False))
    extras["build"] = {
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in res.metrics.items()
        if k in ("n_postings", "payload_bytes", "postings_per_sec",
                 "structure_postings_per_sec", "skew_ratio",
                 "total_docs", "total_tokens", "build_wall_sec_total")
    }

    # ---- incremental add: 1% new docs into the freshly built index,
    # measured as the bounded-staleness pipeline (what steady-state
    # ingest runs): the deferred delta pays only the O(delta) encode +
    # epoch-stale delta scores; the index-wide exact score map is a
    # separate refresh step amortized over K deltas in production.
    # index_add_1pct (= delta + refresh) stays the round-comparable
    # total: the end state is identical to an exact-mode add.
    from wikitfidf_spark.index.build import add_documents, load_manifest, refresh_scores

    # a different seed yields disjoint natural keys (commit embeds the
    # seed) -> clean delta with no doc_id collisions
    delta = make_code_files(spark, n_docs=max(1, n_docs // 100), seed=43)
    timed(
        "index_add_1pct_deferred",
        lambda: add_documents(spark, delta, idx_dir, refresh_scores=False),
    )
    ref_res = timed("index_add_refresh", lambda: refresh_scores(spark, idx_dir))
    timings["index_add_1pct"] = round(
        timings["index_add_1pct_deferred"] + timings["index_add_refresh"], 3
    )
    ph = load_manifest(idx_dir)["phases"].get("delta_g1_stale", {})
    extras["incremental_add"] = {
        "n_new_docs": int(ref_res.metrics["total_docs"]) - n_docs,
        "existing_shards_reencoded": ph.get("existing_shards_reencoded"),
        "new_shards": ph.get("new_shards"),
        "deferred_add_sec_vs_build_sec": round(
            timings["index_add_1pct_deferred"] / timings["index_build"], 3
        ),
        "add_sec_vs_build_sec": round(
            timings["index_add_1pct"] / timings["index_build"], 3
        ),
        "delta_encode_sec": round(ph.get("delta_encode_wall_sec", 0.0), 3),
        "delta_scores_sec": round(ph.get("delta_scores_wall_sec", 0.0), 3),
    }

    idx = InvertedIndex(spark, idx_dir)
    queries = make_queries(100)
    # warm-up (JIT, parquet footer cache), then best-of-3: single-shot
    # q/s on this shared host varies ~1.5-2x run-to-run (measured across
    # identical index states, BENCH.md), which is larger than any plan
    # difference at this batch size — best-of filters the noise
    idx.topk_batch(queries[:4]).count()
    reps = []
    n_rows = 0
    for _ in range(3):
        t0 = time.time()
        n_rows = idx.topk_batch(queries).count()
        reps.append(time.time() - t0)
    timings["batch_topk_100q"] = round(min(reps), 3)
    log(f"batch_topk_100q: {timings['batch_topk_100q']}s (best of {len(reps)})")
    qps = len(queries) / timings["batch_topk_100q"]
    extras["topk_qps"] = round(qps, 2)
    extras["topk_qps_reps"] = [round(len(queries) / t, 1) for t in reps]
    extras["topk_result_rows"] = n_rows
    log(f"batched top-k throughput: {qps:.1f} q/s over {len(queries)} queries")

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_plus_index_build_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bench_corpus_docs": n_docs,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
