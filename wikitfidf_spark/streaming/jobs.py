"""Structured Streaming jobs.

The reference has **no** streaming operators (SURVEY.md §2 coverage
notes — its input channel is a batch iterator), so these are engine
extensions: the standard event-analytics shapes over the ``events``
table, written once as transformations applicable to both batch and
streaming DataFrames.  Tests drive the streaming variant with a parquet
``readStream`` + ``availableNow`` trigger + memory sink and assert parity
with the batch plan (the Spark-idiomatic way to validate a streaming
query hermetically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.  Works on
    batch and streaming inputs alike (F.window is shared)."""
    # quantized int sum: float addition is order-dependent across
    # partitions; int addition is exact at any parallelism
    val_q = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), (F.sum(val_q).cast("double") / F.lit(1e6)).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, events_path: str, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming variant with late-data handling via watermark."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        .withWatermark("ts", watermark)
    )
    return windowed_counts(stream, window)


def dedup_events(events: DataFrame, keys: tuple[str, ...] = ("user_id", "event_type", "ts")) -> DataFrame:
    """Exact event dedup on a key tuple — the batch anchor for the
    streaming variant (same projection + distinct semantics)."""
    return events.select(*keys).distinct()


def stream_dedup_events(
    spark: SparkSession,
    events_path: str,
    keys: tuple[str, ...] = ("user_id", "event_type", "ts"),
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: ``withWatermark + dropDuplicates`` — the
    Structured Streaming stateful-dedup shape for at-least-once
    sources.  State is bounded by the watermark: a key older than the
    watermark is evicted, so a duplicate arriving later than
    ``watermark`` would re-emit — the standard trade; tests drive it
    with availableNow and assert parity with :func:`dedup_events`."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        .withWatermark("ts", watermark)
    )
    return stream.select(*keys).dropDuplicates(list(keys))


DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def trending_term_counts(
    docs: DataFrame,
    *,
    window: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
    stopwords=None,
    min_len: int | None = None,
) -> DataFrame:
    """Windowed term frequencies over a timestamped document stream —
    the time-axis analogue of the batch ``global_top_terms`` operator
    (SURVEY.md §2 S18), shared by batch and streaming inputs.

    Tokenization is the engine's one JVM-side grammar
    (:func:`wikitfidf_spark.tokenize.tokens_col` — codegen'd regex, no
    UDF), exploded stateless, then ONE shuffle on (window, term) with
    additive counts, so streaming partial aggregation (and at 100 TB,
    map-side combine) applies as-is."""
    from ..tokenize import MIN_TOKEN_LEN, tokens_col

    toks = docs.select(
        F.col(ts_col).alias("ts"),
        F.explode(
            tokens_col(text_col, stopwords=stopwords,
                       min_len=MIN_TOKEN_LEN if min_len is None else min_len)
        ).alias("term"),
    )
    return (
        toks.groupBy(F.window("ts", window).alias("w"), "term")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )


def topk_terms_per_window(counts: DataFrame, k: int = 10) -> DataFrame:
    """Per-window top-k finisher with a deterministic tie-break
    (n desc, term asc).  Rank window functions are unsupported on a
    live streaming aggregate, so this runs batch-side — on the
    materialized sink table (the tests' shape) or inside a
    ``foreachBatch`` body; state stays bounded because the upstream
    watermark caps open windows."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def stream_trending_terms(
    spark: SparkSession,
    docs_path: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    stopwords=None,
) -> DataFrame:
    """Streaming trending-terms aggregate: file-source ``readStream``
    over (doc_id, ts, text) rows, watermarked windowed term counts.
    Finish with :func:`topk_terms_per_window` on the sink."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(docs_path)
        .withWatermark("ts", watermark)
    )
    return trending_term_counts(stream, window=window, stopwords=stopwords)


def run_stream_to_memory(
    spark: SparkSession, streaming_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DF to completion over a finite source
    (availableNow) and return the materialized result."""
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap from
    the previous event exceeds ``gap_minutes``.  lag + running sum —
    one shuffle on user_id.  (Streaming analogue: session_window.)"""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (second-truncation would disagree with any
    # engine computing exact epochs)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-safe (session TZ pinned UTC)
    gap = ts_us - F.lag(ts_us).over(w)
    marked = events.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    )
    sid = F.sum("new_session").over(
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        marked.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    *,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization via the built-in ``session_window``
    (preferred when the built-in semantics fit: gap-merged windows,
    state managed by Spark).  Append mode emits a session once the
    watermark passes its close.  Note the built-in's ``end`` is
    last-event + gap; subtract the gap to recover the batch
    ``sessionize`` session_end."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap_minutes} MINUTES")).alias("session_end"),
            "n_events",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start timestamp, session_end timestamp"
)
# per-session triples, not raw events: late data can only EXTEND or
# MERGE sessions (never split), so (start, last, count) is sufficient
# state — O(open sessions), not O(events in the watermark horizon)
SESSION_STATE_SCHEMA = (
    "next_sid long, s_starts array<long>, s_lasts array<long>, s_counts array<long>"
)


def stream_sessionize_stateful(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    *,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful streaming sessionizer: the
    ``applyInPandasWithState`` template for state machines the built-in
    operators can't express.

    Watermark-correct append semantics: per user, state holds a
    (start, last, count) triple per not-yet-finalized session; a
    session is emitted ONLY once the watermark strictly passes
    ``session_end + gap`` — before that, a legal late event (Spark
    drops rows older than the watermark upstream; ts == watermark is
    still admitted) could extend it or merge it with a neighbour.
    Because sessions are chronologically ordered, the finalizable set
    is always a prefix, so emission order and the persisted
    ``next_sid`` counter give monotonic per-user session ids that match
    the batch :func:`sessionize` numbering.  State is O(open sessions)
    (late data can only extend/merge sessions, never split them); the
    event-time timeout flushes finalizable sessions on watermark
    advance even without new data."""
    import numpy as _np
    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        if state.exists:
            next_sid, s_starts, s_lasts, s_counts = state.get
            sessions = [
                [int(a), int(b), int(c)]
                for a, b, c in zip(s_starts or [], s_lasts or [], s_counts or [])
            ]
        else:
            next_sid, sessions = 1, []

        if not state.hasTimedOut:
            for p in pdfs:
                if not len(p):
                    continue
                us = _np.sort(p["ts"].astype("int64").to_numpy() // 1000)  # ns -> us
                # fold the batch into per-session triples first
                brk = _np.flatnonzero(_np.diff(us) > gap_us) + 1
                starts = _np.concatenate(([0], brk))
                ends = _np.concatenate((brk, [len(us)]))
                sessions.extend(
                    [int(us[a]), int(us[b - 1]), int(b - a)] for a, b in zip(starts, ends)
                )

        if not sessions:
            state.update((next_sid, [], [], []))
            return

        # merge: sessions within gap of each other collapse (a late event
        # can bridge two previously-separate sessions)
        sessions.sort()
        merged = [sessions[0]]
        for s in sessions[1:]:
            cur = merged[-1]
            if s[0] - cur[1] <= gap_us:
                cur[1] = max(cur[1], s[1])
                cur[2] += s[2]
            else:
                merged.append(s)

        wm_us = state.getCurrentWatermarkMs() * 1000
        # finalize only when the watermark STRICTLY exceeds close+gap: an
        # event with ts == watermark is still admitted by Spark and would
        # extend a session whose end+gap == watermark
        n_final = 0
        while n_final < len(merged) and merged[n_final][1] + gap_us < wm_us:
            n_final += 1

        out = []
        for start, last, cnt in merged[:n_final]:
            out.append((user, next_sid, cnt, start, last))
            next_sid += 1

        remaining = merged[n_final:]
        state.update((
            next_sid,
            [s[0] for s in remaining],
            [s[1] for s in remaining],
            [s[2] for s in remaining],
        ))
        if remaining:
            # flush when the watermark passes the first open session's close
            state.setTimeoutTimestamp(
                max((remaining[0][1] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield _pd.DataFrame({
                "user_id": [r[0] for r in out],
                "session_id": [r[1] for r in out],
                "n_events": [r[2] for r in out],
                "session_start": _pd.to_datetime([r[3] * 1000 for r in out]),
                "session_end": _pd.to_datetime([r[4] * 1000 for r in out]),
            })

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(events_path)
        .select("user_id", "ts")  # explicit projection: the state fn
        # sees whole rows, so prune before the shuffle
        .withWatermark("ts", watermark)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
