"""Streaming index ingest: Structured Streaming → bounded-staleness
incremental adds.

The reference ingests with a batch iterator over a finished dump
(SURVEY.md §2 S1/S5); a 100 TB deployment ingests continuously.  This
module closes that gap with the Spark-idiomatic shape: a file-source
``readStream`` feeding ``foreachBatch``, where each micro-batch runs
the O(delta) segment add (``add_documents(refresh_scores=False)`` —
zero existing shards re-encoded, scores epoch-stale) and then the
maintenance policy (``maybe_compact``), which amortizes the O(corpus)
exact score refresh over ``max_stale_deltas`` micro-batches and folds
generations once fan-out crosses ``max_structure_files``.

Delivery semantics: the file source + checkpoint give at-least-once
micro-batches (a batch can replay after a crash), and index adds are
deliberately NOT idempotent (duplicate doc_ids raise — that guard
protects postings integrity).  The ingest therefore makes itself
effectively-once by anti-joining each batch against the live docmeta
and the tombstone set before adding: a replayed batch shrinks to the
docs that never landed, and an empty remainder is a no-op.  At scale
this is one broadcast-able join of the (small) micro-batch against a
two-column docmeta projection — O(batch), not O(corpus) shuffled.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    cfg,
    *,
    max_stale_deltas: int = 4,
    max_structure_files: int = 8,
) -> dict:
    """Process ONE micro-batch into the index (the ``foreachBatch``
    body, callable directly for batch backfills and tests).  Returns a
    small status dict for observability."""
    from ..index.build import (
        _tombstones, add_documents, build_index, load_manifest, maybe_compact,
    )

    manifest = load_manifest(index_dir)
    if not manifest.get("paths"):
        # first batch bootstraps the index (fused-encode fresh build).
        # Intra-batch dedup applies HERE too: one trigger can pick up
        # overlapping source files, and build_index's duplicate guard
        # would otherwise fail the batch — which the checkpoint then
        # replays identically forever (a wedged query).
        boot = batch if not cfg.id_cols else batch.withColumn(
            "doc_id", F.xxhash64(*cfg.id_cols)
        )
        boot = boot.dropDuplicates(["doc_id"])
        if cfg.id_cols:
            boot = boot.drop("doc_id")  # build_index re-derives
        res = build_index(spark, boot, index_dir, cfg)
        return {"action": "bootstrap", "docs": int(res.metrics["total_docs"])}

    # effectively-once: drop docs already live OR tombstoned (replays,
    # source overlaps).  doc_id derivation mirrors add_documents.
    ids = batch if not cfg.id_cols else batch.withColumn(
        "doc_id", F.xxhash64(*cfg.id_cols)
    )
    from ..index.build import index_paths

    seen = spark.read.parquet(
        *[os.path.join(index_dir, p) for p in index_paths(manifest)["docmeta"]]
    ).select("doc_id")
    tombs = _tombstones(spark, index_dir, manifest)
    if tombs is not None:
        seen = seen.unionByName(tombs.select("doc_id"))
    # intra-batch dedup too: one trigger can pick up overlapping source
    # files, and add_documents' duplicate guard would otherwise fail the
    # batch — which the checkpoint then replays forever (a wedged query)
    fresh = ids.join(seen, "doc_id", "left_anti").dropDuplicates(["doc_id"])
    if cfg.id_cols:
        fresh = fresh.drop("doc_id")  # add_documents re-derives
    if fresh.isEmpty():
        return {"action": "noop", "docs": 0}

    add_documents(spark, fresh, index_dir, refresh_scores=False)
    maintenance = maybe_compact(
        spark, index_dir,
        max_structure_files=max_structure_files,
        max_stale_deltas=max_stale_deltas,
    )
    m = load_manifest(index_dir)
    if maintenance is None:
        action = "none"
    else:  # phase names record which branch ran: compact_vN / refresh_vN
        last_phase = list(m["phases"])[-1]
        action = "compact" if last_phase.startswith("compact_") else "refresh"
    return {
        "action": "add",
        "maintenance": action,
        "stale_deltas": int(m.get("stale_deltas", 0)),
        "docs": int(m["metrics"].get("live_total_docs", m["metrics"]["total_docs"])),
    }


def stream_index_ingest(
    spark: SparkSession,
    docs_path: str,
    index_dir: str,
    cfg,
    *,
    schema: str,
    checkpoint: str,
    max_stale_deltas: int = 4,
    max_structure_files: int = 8,
    max_files_per_trigger: int | None = None,
    on_batch: Callable[[dict], None] | None = None,
    processing_time: str | None = None,
):
    """Start the streaming ingest query: new parquet files under
    ``docs_path`` flow into the index as bounded-staleness deltas.
    Returns the StreamingQuery.

    Trigger: by default ``availableNow`` — drain everything present,
    then stop (batch backfills, tests, cron-style catch-up runs).  Pass
    ``processing_time`` (e.g. ``"30 seconds"``) for a long-running
    query that keeps picking up new files at that cadence."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        status = ingest_batch(
            spark, batch_df, index_dir, cfg,
            max_stale_deltas=max_stale_deltas,
            max_structure_files=max_structure_files,
        )
        status["batch_id"] = int(batch_id)
        if on_batch is not None:
            on_batch(status)

    writer = (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
