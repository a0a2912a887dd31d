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

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: language-code -> word-list name (AvailableLanguage parity,
#: badwords.go:20-48, including the 'simple'/'cr' aliases — 'cr' is the
#: reference's test-mode wiki).  The lists themselves are original data
#: in wikitfidf_spark/data/badwords/<name> (one lowercase word per
#: line); drop additional files there to enable more languages.
#: eo/ru/tr: the reference SHIPS data files for esperanto, russian and
#: turkish (internal/badwords/data/) but its code map never exposes a
#: language code for them — here they are mapped so the shipped data is
#: reachable (documented deviation: data-dir parity over map parity).
LANGUAGES: dict[str, str] = {
    "en": "english", "ar": "arabic", "da": "danish", "nl": "dutch",
    "fi": "finnish", "fr": "french", "de": "german", "hu": "hungarian",
    "it": "italian", "no": "norwegian", "pt": "portuguese",
    "es": "spanish", "sv": "swedish", "zh": "chinese", "cs": "czech",
    "hi": "hindi", "ja": "japanese", "ko": "korean", "fa": "persian",
    "pl": "polish", "th": "thai", "eo": "esperanto", "ru": "russian",
    "tr": "turkish", "simple": "english", "cr": "english",
}

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "badwords")


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


def available_language(lang: str, data_dir: str = DATA_DIR) -> tuple[str | None, bool]:
    """AvailableLanguage parity (badwords.go:20-48): map a language code
    to its word-list name; ``(None, False)`` when unsupported OR when
    the mapped list file isn't shipped (the reference bundles all its
    lists, so map membership implies data; here data presence is part of
    availability)."""
    name = LANGUAGES.get(lang)
    if name is None or not os.path.exists(os.path.join(data_dir, name)):
        return None, False
    return name, True


def flagged_terms_for_lang(lang: str, data_dir: str = DATA_DIR) -> list[str] | None:
    """Language-gated list load: ``None`` when unavailable — callers
    skip the whole report in that case, exactly like the reference's
    ``if language, isAvailable := AvailableLanguage(lang)`` guard
    (badwords.go:69-72)."""
    name, ok = available_language(lang, data_dir)
    if not ok:
        return None
    return load_flagged_terms(os.path.join(data_dir, name))


def badwords_report_for_lang(
    tf: DataFrame,
    doclens: DataFrame,
    lang: str,
    *,
    doc_id: str = "doc_id",
    topic: str | None = None,
    data_dir: str = DATA_DIR,
) -> DataFrame | None:
    """The reference's full BadWords flow (badwords.go:69-189): gate on
    language availability, load the newline list, emit the report —
    ``None`` (no report at all) for unsupported languages."""
    terms = flagged_terms_for_lang(lang, data_dir)
    if terms is None:
        return None
    return badwords_report(tf, doclens, terms, doc_id=doc_id, topic=topic)


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
