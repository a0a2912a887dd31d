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
    "value double, props map<string,string>"
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


def run_stream_to_memory(spark: SparkSession, streaming_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming DF to completion over a finite source
    (availableNow) and return the materialized result."""
    q = (
        streaming_df.writeStream.outputMode("complete")
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
