"""Exporter parity: the reference's four final gzip-JSON artifacts and
the read/query API over them (reference S20 sinks + Q1-Q5 readers).

Reference mapping:

- artifact names          exporter.go:23-28
- ``From`` existence gate exporter.go:32-53  -> :meth:`Exporter.from_dir`
- ``Delete``              exporter.go:56-71  -> :meth:`Exporter.delete`
- ``GlobalWords`` (Q1)    exporter.go:80-108 -> :meth:`Exporter.global_words`
- ``Pages`` (Q2)          exporter.go:119-171 -> :meth:`Exporter.pages`
- ``Topics`` (Q3)         exporter.go:182-238 -> :meth:`Exporter.topics`
- ``PageBadwords`` (Q4)   exporter.go:251-310 -> :meth:`Exporter.page_badwords`
- ``Limits`` defaults     wikitfidf.go:41-57

Shape deviation (documented, deliberate): the reference writes each
artifact as ONE gzip file holding a single giant JSON dict streamed
line-by-line (pagemapaggregator.go:68-79).  A single file is a
single-writer bottleneck at scale, so we write standard partitioned
JSONL with gzip codec (``df.write.json(..., compression="gzip")``) —
same rows, same compression, parallel writers — and the readers return
DataFrames in the documented orders instead of Go channels.

Reference quirks NOT replicated (latent bugs, documented in SURVEY.md
§2 Q1/Q3): the reference reader looks up sentinel keys its writers
never emit ("@TOTAL Words" vs "@Total Word", "@TOT"), so its
``TotalWords`` fields are always 0.  We store the totals in a tiny
``_totals`` sidecar instead of magic dict keys.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import badwords as bw
from .operators import stemdict, termstats, topk, scoring

# exporter.go:23-28
GLOBAL_PAGES_TFIDF = "GlobalPagesTFIDF_topN.json.gz"
GLOBAL_TOPICS_WORDS = "GlobalTopicsWords_topN.json.gz"
GLOBAL_WORDS = "GlobalWords_topN.json.gz"
BADWORDS_REPORT = "BadWordsReport.json.gz"
TOTALS = "_totals.json"

_ARTIFACTS = (GLOBAL_PAGES_TFIDF, GLOBAL_TOPICS_WORDS, GLOBAL_WORDS, BADWORDS_REPORT)


@dataclass
class Limits:
    """wikitfidf.Limits with ReasonableLimits defaults (wikitfidf.go:41-57)."""

    words_pages: int = 50
    global_words: int = 100
    topic_words: int = 100
    reverts: int = 10


def export_artifacts(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    flagged_terms: list[str],
    limits: Limits | None = None,
    *,
    doc_id: str = "doc_id",
    topic: str = "lang",
    text: str = "text",
    stem_py=None,
) -> dict:
    """Compute and write the four artifacts from the raw document table.

    One DataFrame lineage per artifact (shared tf scan cached);
    replaces the reference's 10-stage disk-materialized chain
    (wikitfidf.go:99-224).

    ``stem_py``: optional ``str -> str`` stemmer.  When given, the whole
    chain runs over stems — tf re-keyed by stem (S7), the stem-reverse
    dictionary built with the (len, word)-min merge (S8/S11,
    stemrevaggregator.go:53-61) — and the per-page + global word
    artifacts are de-stemmed at export exactly like the reference's
    destemmer.pyx:45-101 (GlobalPagesTFIDF + GlobalWords destemmed,
    topics left stemmed; unmatched terms pass through via coalesce)."""
    lim = limits or Limits()
    os.makedirs(out_dir, exist_ok=True)

    tf = termstats.term_frequencies(
        docs, doc_id=doc_id, text=text, extra_cols=(topic,)
    )
    dictionary = None
    if stem_py is not None:
        stem_fn = stemdict.column_stemmer(stem_py)
        dictionary = stemdict.stem_dict(
            tf.select("term").distinct(), stem_fn=stem_fn
        ).cache()
        tf = stemdict.stem_terms(tf, stem_fn)
    tf = tf.cache()
    doclens = termstats.doc_lengths(tf, doc_id=doc_id)
    stats = termstats.global_term_stats(tf.select(doc_id, "term", "tf"), doc_id=doc_id)
    total_tokens, total_docs = termstats.totals(tf, doc_id=doc_id)

    def write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").option("compression", "gzip").json(
            os.path.join(out_dir, name)
        )

    # GlobalPagesTFIDF_topN (S13 + S17): per-doc top-N by reference tfidf
    tfidf = scoring.tfidf_scores(
        tf.select(doc_id, "term", "tf"), stats, doclens, total_docs, doc_id=doc_id
    )
    pages_top = topk.top_n_words_per_doc(tfidf, lim.words_pages, doc_id=doc_id)
    if dictionary is not None:  # destemmer.pyx:45-82 (after top-N, like the reference)
        pages_top = stemdict.destem(pages_top, dictionary)
    write(pages_top, GLOBAL_PAGES_TFIDF)

    # GlobalWords_topN (S18): top-N by collection frequency
    words_top = topk.top_n_global_terms(stats, lim.global_words)
    if dictionary is not None:  # destemmer.pyx:85-101
        words_top = stemdict.destem(words_top, dictionary)
    write(words_top, GLOBAL_WORDS)

    # GlobalTopicsWords_topN (S15 + S19): docs-in-topic-containing-term
    topic_counts = termstats.topic_term_doc_counts(tf, doc_id=doc_id, topic=topic)
    write(topk.top_n_terms_per_topic(topic_counts, lim.topic_words, topic=topic), GLOBAL_TOPICS_WORDS)

    # BadWordsReport (S16): distinct flagged terms per doc
    report = bw.badwords_report(
        tf.select(doc_id, topic, "term", "tf"), doclens, flagged_terms,
        doc_id=doc_id, topic=topic,
    )
    write(report, BADWORDS_REPORT)

    totals = {"total_tokens": total_tokens, "total_docs": total_docs}
    import json as _json

    with open(os.path.join(out_dir, TOTALS), "w") as f:
        _json.dump(totals, f)
    tf.unpersist()
    if dictionary is not None:
        dictionary.unpersist()
    return totals


class Exporter:
    """Read API over an exported artifact directory (Q1-Q5)."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.out_dir = out_dir

    # ---- From (exporter.go:32-53): validate artifacts exist
    @classmethod
    def from_dir(cls, spark: SparkSession, out_dir: str) -> "Exporter":
        missing = [
            a for a in _ARTIFACTS
            if not os.path.exists(os.path.join(out_dir, a, "_SUCCESS"))
        ]
        # the sidecar is written last, so its presence also proves the
        # export completed (a crash mid-export would otherwise pass
        # validation and fail later in totals())
        if not os.path.exists(os.path.join(out_dir, TOTALS)):
            missing.append(TOTALS)
        if missing:
            raise FileNotFoundError(f"missing artifacts in {out_dir}: {missing}")
        return cls(spark, out_dir)

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.json(os.path.join(self.out_dir, name))

    def totals(self) -> dict:
        import json as _json

        with open(os.path.join(self.out_dir, TOTALS)) as f:
            return _json.load(f)

    # ---- Q1: global words (+ the total the reference loses to its
    # sentinel-name bug)
    def global_words(self) -> DataFrame:
        return self._read(GLOBAL_WORDS)

    # ---- Q2: pages stream, ascending doc order (exporter.go:119-171)
    def pages(self) -> DataFrame:
        return self._read(GLOBAL_PAGES_TFIDF).orderBy("doc_id", "rank")

    # ---- Q3: topics
    def topics(self) -> DataFrame:
        return self._read(GLOBAL_TOPICS_WORDS)

    # ---- Q4: badwords pages, descending (exporter.go:250)
    def page_badwords(self) -> DataFrame:
        return self._read(BADWORDS_REPORT).orderBy(F.desc("abs"), F.asc("doc_id"))

    # ---- Q5: delete (exporter.go:56-71)
    def delete(self) -> None:
        for a in (*_ARTIFACTS, TOTALS):
            p = os.path.join(self.out_dir, a)
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
