"""Streaming index ingest: Structured Streaming micro-batches →
bounded-staleness segment adds → maintenance policy → convergence to a
fresh-build-identical index.  Engine extension beyond the reference's
batch-iterator ingest (SURVEY.md §2 notes); delivery semantics
(effectively-once via docmeta anti-join) tested directly."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from wikitfidf_spark.corpus import make_code_files
from wikitfidf_spark.index.build import (
    IndexConfig, build_index, load_manifest, refresh_scores,
)
from wikitfidf_spark.index.query import InvertedIndex, Query
from wikitfidf_spark.streaming.ingest import ingest_batch, stream_index_ingest

CFG = IndexConfig(n_shards=4, n_salts=2, block_size=32)
DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"
QS = [Query(0, ["arg_cfg_get", "core_write_run"], "OR", 10),
      Query(1, ["data_repo_map"], "OR", 10)]


def _topk(spark, d):
    return sorted(
        (r["query_id"], r["doc_id"], r["score_q"], r["rank"])
        for r in InvertedIndex(spark, d).topk_batch(QS).collect()
    )


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    """Drive the full pipeline once: 3 files → 3 micro-batches
    (bootstrap + 2 deferred adds, policy refresh at the 2nd)."""
    root = tmp_path_factory.mktemp("stream_ingest")
    src_dir, idx_dir = str(root / "src"), str(root / "idx")
    ckpt = str(root / "ckpt")
    os.makedirs(src_dir)

    docs = make_code_files(spark, n_docs=300, seed=42).cache()
    third = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    for i in range(3):
        part_dir = str(root / f"part{i}")
        docs.filter(third == i).coalesce(1).write.parquet(part_dir)
        (src,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        shutil.copy(src, os.path.join(src_dir, f"batch_{i}.parquet"))

    statuses = []
    q = stream_index_ingest(
        spark, src_dir, idx_dir, CFG,
        schema=DOCS_SCHEMA, checkpoint=ckpt,
        max_stale_deltas=2, max_files_per_trigger=1,
        on_batch=statuses.append,
    )
    q.awaitTermination()
    return docs, idx_dir, statuses


def test_stream_ingest_batch_sequence(streamed):
    """bootstrap → deferred add → deferred add + policy refresh."""
    _, idx_dir, statuses = streamed
    assert [s["action"] for s in statuses] == ["bootstrap", "add", "add"]
    assert statuses[1]["maintenance"] == "none"
    assert statuses[1]["stale_deltas"] == 1
    # 2nd deferred add hits max_stale_deltas=2 → the policy refreshes
    assert statuses[2]["maintenance"] == "refresh"
    assert statuses[2]["stale_deltas"] == 0
    assert statuses[2]["docs"] == 300


def test_stream_ingest_converges_to_fresh_build(spark, streamed, tmp_path):
    """After the policy refresh the streamed index answers identically
    to a fresh build over the full corpus (exact global stats)."""
    docs, idx_dir, _ = streamed
    full_dir = str(tmp_path / "idx_full")
    build_index(spark, docs, full_dir, CFG, resume=False)
    m = load_manifest(idx_dir)
    if m.get("stale_deltas"):  # close any tail staleness deterministically
        refresh_scores(spark, idx_dir)
    assert _topk(spark, full_dir) == _topk(spark, idx_dir)


def test_replayed_batch_is_noop(spark, streamed):
    """At-least-once delivery: re-processing an already-ingested batch
    anti-joins down to nothing and leaves the index untouched."""
    docs, idx_dir, _ = streamed
    before = load_manifest(idx_dir)
    third = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    status = ingest_batch(spark, docs.filter(third == 1), idx_dir, CFG)
    assert status["action"] == "noop"
    after = load_manifest(idx_dir)
    assert after["version"] == before["version"]
    assert after["phases"].keys() == before["phases"].keys()


def test_partial_replay_adds_only_missing_docs(spark, streamed):
    """A batch overlapping already-ingested docs adds only the truly
    new ones (the docmeta anti-join shrinks the delta)."""
    docs, idx_dir, _ = streamed
    extra = make_code_files(spark, n_docs=40, seed=99)
    third = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    mixed = docs.filter(third == 0).unionByName(extra)
    n_extra = extra.join(
        docs, ["repo", "path", "commit"], "left_anti"
    ).count()  # seed-99 keys are disjoint from seed-42's in practice
    before_docs = int(load_manifest(idx_dir)["metrics"].get(
        "live_total_docs", load_manifest(idx_dir)["metrics"]["total_docs"]
    ))
    status = ingest_batch(spark, mixed, idx_dir, CFG)
    assert status["action"] == "add"
    assert status["docs"] == before_docs + n_extra


def test_bootstrap_batch_with_duplicate_ids(spark, tmp_path):
    """The FIRST micro-batch dedups before build_index just like the
    add path: one trigger picking up overlapping source files must not
    trip the duplicate-id guard (a failed first batch replays
    identically from the checkpoint forever — a wedged query)."""
    docs = make_code_files(spark, n_docs=50, seed=7)
    dup = docs.unionByName(docs.limit(10))
    status = ingest_batch(spark, dup, str(tmp_path / "idx_boot_dup"), CFG)
    assert status == {"action": "bootstrap", "docs": 50}
