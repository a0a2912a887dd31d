"""SparkSession factory.

Local mode is the sandbox stand-in for a cluster: ``local[N]`` = one JVM
with N executor threads.  All operators are written against the
multi-executor model (explicit partitioning, broadcast hints, no
driver-side collects in hot paths) so the same code runs unchanged under
``spark-submit --py-files`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _resolve_master(master: str | None = None) -> str:
    """Pick the master URL: explicit arg > $SPARK_GRAFT_MASTER >
    local[$SPARK_GRAFT_CPUS] > local[*].  Empty env values (unset shell
    interpolation, e.g. ``SPARK_GRAFT_MASTER= python bench.py``) fall
    back like unset — "" and "local[]" are not parseable master URLs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    return master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % cpus


def get_spark(
    app_name: str = "wikitfidf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "24g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing + skew-join mitigation complement the
      explicit salting in :mod:`wikitfidf_spark.operators.termstats`.
    - Arrow on: every Python-side operator in this engine is a
      vectorized pandas/Arrow UDF (no per-row Python, per
      BASELINE.json:input_hint).
    - UTC session timezone: required for DuckDB-oracle comparisons.
    """
    master = _resolve_master(master)
    if shuffle_partitions is None:
        # match parallelism: local[N] -> N, local[N,F] -> N (the second
        # field is maxFailures), local[*] -> cpu count
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        cores = inner.split(",")[0].strip()
        try:
            shuffle_partitions = max(int(cores), 1)
        except ValueError:
            shuffle_partitions = os.cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
