"""Stem-reverse dictionary (reference S8 + S11).

The reference remembers, per stem, the shortest original word seen
(strictly-shorter replaces, ties keep first — textnormalizer.pyx:124-139,
stemrevaggregator.go:53-61).  "Ties keep first" is arrival-order
dependent; we make it total with (length asc, word asc) —
SURVEY.md §2 S8's documented determinism fix.

For the code corpus there is no linguistic stemmer; the default stem
function is a deterministic prefix (identifier root before the last
``_<digits>`` suffix, else the first segment), enough to exercise the
min-by-length merge semantics and the S14 de-stemming join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_stem(term: Column) -> Column:
    """Strip a trailing digit run, else keep the term; deterministic and
    expressible in both Spark and DuckDB (regexp_replace)."""
    return F.regexp_replace(term, "[0-9]+$", "")


def stem_dict(terms: DataFrame, *, term_col: str = "term") -> DataFrame:
    """(stem, original): shortest original per stem, (len, word) min."""
    stemmed = terms.select(
        default_stem(F.col(term_col)).alias("stem"), F.col(term_col).alias("original")
    )
    return stemmed.groupBy("stem").agg(
        F.min_by("original", F.struct(F.length("original"), F.col("original"))).alias("original")
    )


def destem(df: DataFrame, dictionary: DataFrame, *, term_col: str = "term") -> DataFrame:
    """S14 (destemmer.pyx:45-82): replace stems with originals via a
    broadcast left join; unmatched terms pass through (coalesce)."""
    d = F.broadcast(dictionary.withColumnRenamed("stem", term_col))
    return (
        df.join(d, term_col, "left")
        .withColumn(term_col, F.coalesce("original", term_col))
        .drop("original")
    )
