"""Badwords report (reference S16, badwords.go:69-189).

Semantics replicated exactly (SURVEY.md §2 — quirks preserved, not
fixed): the reference iterates the *keys* of each page's word map
(badwords.go:136-144), so ``abs`` counts **distinct** flagged terms, not
occurrences; ``rel = abs / doc_len``; pages with zero matches are
omitted (they never enter the report).

Physical plan: the flagged list is tiny (the reference loads it as an
in-memory set, badwords.go:50-66) → broadcast hash join; the inner join
naturally drops clean docs; one shuffle for the per-doc agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def badwords_report(
    tf: DataFrame,
    doclens: DataFrame,
    flagged: Sequence[str] | DataFrame,
    *,
    doc_id: str = "doc_id",
    topic: str | None = None,
) -> DataFrame:
    """(doc_id[, topic], abs, rel) over per-doc term frequencies.

    ``tf`` rows are distinct per (doc, term), so ``count(*)`` after the
    semi-ish inner join equals the reference's distinct-key count.
    """
    spark = SparkSession.getActiveSession()
    if not isinstance(flagged, DataFrame):
        flagged = spark.createDataFrame([(w,) for w in flagged], "term string")
    keys = [doc_id] + ([topic] if topic else [])
    hits = tf.join(F.broadcast(flagged), "term", "inner")
    return (
        hits.groupBy(*keys)
        .agg(F.count("*").alias("abs"))
        .join(doclens, doc_id)
        .select(*keys, "abs", (F.col("abs").cast("double") / F.col("doc_len").cast("double")).alias("rel"))
    )


def load_flagged_terms(path: str) -> list[str]:
    """Load a flagged-term list from a newline-delimited word file —
    the reference's badwords data format (badwords.go:50-66 reads
    ``data/<language>`` files of one lowercase word per line; blank
    lines skipped).  Returns deduplicated terms in file order."""
    seen: dict[str, None] = {}
    with open(path) as f:
        for line in f:
            w = line.strip()
            if w:
                seen.setdefault(w, None)
    return list(seen)
