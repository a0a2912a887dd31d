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
SESSION_STATE_SCHEMA = "session_id long, start_us long, last_us long, n_events long"


def stream_sessionize_stateful(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming sessionizer: the
    ``applyInPandasWithState`` template for state machines the built-in
    operators can't express.  Per user, state = the open session
    (id, start, last, count); each micro-batch folds its events in
    vectorized pandas (no per-event Python beyond one tiny per-session
    groupby), emits sessions closed by a gap within the batch, and arms
    an event-time timeout that flushes the open session once the
    watermark passes last_event + gap."""
    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])

        def emit(rows):
            return _pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_id": [r[1] for r in rows],
                    "n_events": [r[2] for r in rows],
                    "session_start": _pd.to_datetime([r[3] * 1000 for r in rows]),
                    "session_end": _pd.to_datetime([r[4] * 1000 for r in rows]),
                }
            )

        if state.hasTimedOut:
            sid, start_us, last_us, n = state.get
            state.remove()
            yield emit([(user, sid, n, start_us, last_us)])
            return

        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        ev = _pd.concat(batches).sort_values(["ts", "event_id"])
        us = ev["ts"].astype("int64").to_numpy() // 1000  # ns -> us

        if state.exists:
            sid, start_us, last_us, n_open = state.get
        else:
            sid, start_us, last_us, n_open = 1, None, None, 0

        import numpy as _np

        prev = _np.empty_like(us)
        prev[1:] = us[:-1]
        prev[0] = last_us if last_us is not None else us[0] - gap_us - 1
        new_flag = (us - prev) > gap_us
        grp = _np.cumsum(new_flag)  # 0 = continuation of the open session
        agg = _pd.DataFrame({"g": grp, "us": us}).groupby("g")["us"].agg(["size", "min", "max"])

        closed = []
        for g, row in agg.iterrows():
            cnt, mn, mx = int(row["size"]), int(row["min"]), int(row["max"])
            if g == 0 and start_us is not None:
                cur = (sid, start_us, mx, n_open + cnt)  # extend open session
            else:
                if start_us is not None:  # gap after the open state session
                    closed.append((user, sid, n_open, start_us, last_us))
                    sid += 1
                cur = (sid, mn, mx, cnt)
            if g < agg.index.max():
                # this session is closed by a later in-batch event
                closed.append((user, cur[0], cur[3], cur[1], cur[2]))
                sid = cur[0] + 1
                start_us, last_us, n_open = None, None, 0
            else:
                sid, start_us, last_us, n_open = cur

        state.update((sid, start_us, last_us, n_open))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + gap_us // 1000, wm + 1))
        if closed:
            yield emit(closed)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        .select("user_id", "ts", "event_id")  # explicit projection: the
        # state fn sees whole rows, so prune before the shuffle
        .withWatermark("ts", watermark)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
