"""Ingest-side filters (reference S2/S3, cmd/dothething/filter.go).

- S2 page semi-filter: keep rows whose key is in a provided list; empty
  list = pass-all (filter.go:15-30).  Expressed as a broadcast left-semi
  join (scales to arbitrarily long lists) with an ``isin`` fast path.
- S3 range filter: open-ended end defaults "to the future"
  (filter.go:32-49 uses now+24h; we use an explicit literal so plans are
  deterministic).  Plain predicate → pushed into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ISIN_MAX = 64  # beyond this, a semi-join beats a giant In() predicate


def semi_filter(df: DataFrame, key_col: str, keys: Sequence | DataFrame | None) -> DataFrame:
    if keys is None:
        return df
    if isinstance(keys, DataFrame):
        right = keys.toDF(key_col)
        return df.join(F.broadcast(right), key_col, "left_semi")
    keys = list(keys)
    if not keys:  # reference: empty special list = keep everything
        return df
    if len(keys) <= ISIN_MAX:
        return df.filter(F.col(key_col).isin(keys))
    spark = SparkSession.getActiveSession()
    # infer the key type from the values (a hardcoded type would crash
    # or mis-join for non-string keys), then cast to the source column's
    # type so the join key resolves exactly
    right = spark.createDataFrame([(k,) for k in keys], [key_col]).select(
        F.col(key_col).cast(df.schema[key_col].dataType).alias(key_col)
    )
    return df.join(F.broadcast(right), key_col, "left_semi")


def range_filter(df: DataFrame, col: str, start=None, end=None, *, closed: bool = False) -> DataFrame:
    """Reference uses strict inequalities startDate < ts < endDate
    (filter.go:48); ``closed=True`` gives the inclusive variant."""
    c = F.col(col)
    if start is not None:
        df = df.filter(c >= F.lit(start) if closed else c > F.lit(start))
    if end is not None:
        df = df.filter(c <= F.lit(end) if closed else c < F.lit(end))
    return df
