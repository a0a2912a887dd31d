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


def _resolve_lang_norm(lang, stem_py):
    """(NormalizationProfile | None, stem_py) for an optional language:
    the profile's stemmer becomes the default stem_py (an explicit one
    wins).  Shared by both artifact writers so profile resolution can
    never diverge between them."""
    if lang is None:
        return None, stem_py
    from .operators.normalize import profile_for_lang

    norm = profile_for_lang(lang)
    if stem_py is None and norm.stemmer is not None:
        stem_py = stemdict.STEMMERS[norm.stemmer]
    return norm, stem_py


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
    lang: str | None = None,
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
    topics left stemmed; unmatched terms pass through via coalesce).

    ``lang``: optional language code — resolves the FULL normalization
    profile (operators.normalize: stopwords dropped on the surface
    token, per-language min token length, letter class, stemmer) so
    the whole artifact chain runs exactly like one reference
    per-language pipeline invocation.  An explicit ``stem_py`` wins
    over the profile's stemmer."""
    lim = limits or Limits()
    os.makedirs(out_dir, exist_ok=True)
    norm, stem_py = _resolve_lang_norm(lang, stem_py)
    frames = _artifact_frames(
        spark, docs, flagged_terms, lim,
        doc_id=doc_id, topic=topic, text=text, stem_py=stem_py, norm=norm,
    )

    def write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").option("compression", "gzip").json(
            os.path.join(out_dir, name)
        )

    write(frames["pages"], GLOBAL_PAGES_TFIDF)
    write(frames["words"], GLOBAL_WORDS)
    write(frames["topics"], GLOBAL_TOPICS_WORDS)
    write(frames["badwords"], BADWORDS_REPORT)

    totals = frames["totals"]
    import json as _json

    with open(os.path.join(out_dir, TOTALS), "w") as f:
        _json.dump(totals, f)
    _unpersist_frames(frames)
    return totals


def _artifact_frames(
    spark: SparkSession,
    docs: DataFrame,
    flagged_terms: list[str],
    lim: "Limits",
    *,
    doc_id: str,
    topic: str,
    text: str,
    stem_py,
    norm=None,
) -> dict:
    """The four artifact DataFrames + totals, shared by the partitioned
    JSONL writer (the scale path) and the reference-shape compat writer.
    ``norm``: optional NormalizationProfile — stopword/min-len/letters
    knobs for the tokenize (stopwords drop on the SURFACE token, before
    any stemming: the reference's order, textnormalizer.pyx:103-121)."""
    tf = termstats.term_frequencies(
        docs, doc_id=doc_id, text=text, extra_cols=(topic,),
        stopwords=norm.stopwords if norm else None,
        min_len=norm.min_len if norm else None,
        letters=norm.letters if norm else None,
    )
    dictionary = None
    tf_raw = None
    if stem_py is not None:
        # cache the PRE-stem tf: it feeds both the stem-reverse
        # dictionary and the stemmed tf — without it the full tokenize
        # scan (the dominant cost) would run twice
        tf_raw = tf.cache()
        stem_fn = stemdict.column_stemmer(stem_py)
        dictionary = stemdict.stem_dict(
            tf_raw.select("term").distinct(), stem_fn=stem_fn
        ).cache()
        tf = stemdict.stem_terms(tf_raw, stem_fn)
    tf = tf.cache()
    doclens = termstats.doc_lengths(tf, doc_id=doc_id)
    stats = termstats.global_term_stats(tf.select(doc_id, "term", "tf"), doc_id=doc_id)
    total_tokens, total_docs = termstats.totals(tf, doc_id=doc_id)

    # GlobalPagesTFIDF_topN (S13 + S17): per-doc top-N by reference tfidf
    tfidf = scoring.tfidf_scores(
        tf.select(doc_id, "term", "tf"), stats, doclens, total_docs, doc_id=doc_id
    )
    pages_top = topk.top_n_words_per_doc(tfidf, lim.words_pages, doc_id=doc_id)
    if dictionary is not None:  # destemmer.pyx:45-82 (after top-N, like the reference)
        pages_top = stemdict.destem(pages_top, dictionary)

    # GlobalWords_topN (S18): top-N by collection frequency
    words_top = topk.top_n_global_terms(stats, lim.global_words)
    if dictionary is not None:  # destemmer.pyx:85-101
        words_top = stemdict.destem(words_top, dictionary)

    # GlobalTopicsWords_topN (S15 + S19): docs-in-topic-containing-term
    topic_counts = termstats.topic_term_doc_counts(tf, doc_id=doc_id, topic=topic)
    topics_top = topk.top_n_terms_per_topic(topic_counts, lim.topic_words, topic=topic)

    # BadWordsReport (S16): distinct flagged terms per doc.  The
    # reference runs BadWords AFTER destemming (wikitfidf.go:181-207):
    # it matches the flagged SURFACE list against each stem's destemmed
    # representative in the page word map.  With a stemmer active the
    # tf here is stem-keyed, so map the flagged list into stem space
    # through the same dictionary first (a stem is flagged iff its
    # shortest-original representative is flagged) — joining surface
    # words against stems would silently miss every inflected entry.
    if dictionary is not None:
        flagged_join = (
            dictionary.join(
                spark.createDataFrame(
                    [(w,) for w in flagged_terms], "original string"
                ),
                "original",
            ).select(F.col("stem").alias("term"))
        )
    else:
        flagged_join = flagged_terms
    report = bw.badwords_report(
        tf.select(doc_id, topic, "term", "tf"), doclens, flagged_join,
        doc_id=doc_id, topic=topic,
    )
    return {
        "pages": pages_top,
        "words": words_top,
        "topics": topics_top,
        "badwords": report,
        "doclens": doclens,
        # doc_id/topic recorded so the read API (Exporter) resolves the
        # caller's column names instead of assuming the defaults
        "totals": {
            "total_tokens": total_tokens,
            "total_docs": total_docs,
            "doc_id": doc_id,
            "topic": topic,
        },
        "_tf": tf,
        "_tf_raw": tf_raw,
        "_dictionary": dictionary,
    }


def _unpersist_frames(frames: dict) -> None:
    frames["_tf"].unpersist()
    if frames["_tf_raw"] is not None:
        frames["_tf_raw"].unpersist()
    if frames["_dictionary"] is not None:
        frames["_dictionary"].unpersist()


def write_compat_artifacts(
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
    lang: str | None = None,
) -> dict:
    """Reference-exact artifact files for drop-in consumers: each
    artifact is ONE gzip (level 9 — badwords.go:80,
    topwordspageextractor.pyx:62-63) holding a single JSON dict in the
    reference's shapes:

    - ``GlobalWords_topN.json.gz``      {word: cf}
      (topwordspageextractor.pyx:44-51 — sentinel rows filtered)
    - ``GlobalPagesTFIDF_topN.json.gz`` {doc: {TopicID, Tot, Words:{word: tfidf}}}
      (structures.TfidfTopNWordPage)
    - ``GlobalTopicsWords_topN.json.gz``{topic: {word: n_docs}}
      (topicwords.go:131)
    - ``BadWordsReport.json.gz``        {doc: {TopicID, Abs, Rel, BadW:{word: 1}}}
      (structures.BadWordsReport; BadW values are always 1 because the
      reference iterates the page's word-map KEYS, so its ``++`` branch
      is dead code — badwords.go:135-143; replicated)

    Single-writer by design — the reference's single-file shape IS a
    single-writer bottleneck, which is why :func:`export_artifacts`
    (partitioned JSONL) remains the scale path.  Rows stream through
    ``toLocalIterator`` so the driver holds one partition at a time,
    never the whole artifact.  Deviations: files are strict valid JSON
    (the reference's streamed writers leave a trailing ``,\\n`` before
    the closing brace — a latent quirk its line-wise readers tolerate);
    ``TopicID`` is this engine's topic value verbatim (a string topic
    column stays a JSON string) where the reference hard-codes its
    negapedia uint32 topic enum — there is no meaningful uint32 mapping
    for arbitrary topic domains.
    """
    import gzip as _gzip
    import json as _json

    lim = limits or Limits()
    os.makedirs(out_dir, exist_ok=True)
    norm, stem_py = _resolve_lang_norm(lang, stem_py)
    frames = _artifact_frames(
        spark, docs, flagged_terms, lim,
        doc_id=doc_id, topic=topic, text=text, stem_py=stem_py, norm=norm,
    )

    def stream_dict(name: str, entries) -> None:
        with _gzip.GzipFile(
            filename=os.path.join(out_dir, name), mode="w", compresslevel=9
        ) as gz:
            gz.write(b"{")
            first = True
            for key, value in entries:
                chunk = f"{_json.dumps(str(key))}: {_json.dumps(value)}"
                gz.write((chunk if first else ",\n" + chunk).encode("utf-8"))
                first = False
            gz.write(b"}")

    stream_dict(
        "GlobalWords_topN.json.gz",
        ((r["term"], int(r["cf"])) for r in frames["words"].toLocalIterator()),
    )

    # pages: group the per-(doc, term) top-N rows into one entry per doc.
    # Rows arrive doc-clustered (window partitioned by doc) after a sort.
    def page_entries():
        cur_id, cur = None, None
        tot_by_doc = frames["doclens"]
        pages = (
            frames["pages"]
            .join(tot_by_doc, doc_id)
            .join(docs.select(doc_id, F.col(topic).alias("_topic")), doc_id)
            .orderBy(doc_id, "rank")
        )
        for r in pages.toLocalIterator():
            if r[doc_id] != cur_id:
                if cur_id is not None:
                    yield cur_id, cur
                cur_id = r[doc_id]
                cur = {"TopicID": r["_topic"], "Tot": int(r["doc_len"]), "Words": {}}
            cur["Words"][r["term"]] = r["tfidf"]
        if cur_id is not None:
            yield cur_id, cur

    stream_dict("GlobalPagesTFIDF_topN.json.gz", page_entries())

    def topic_entries():
        cur_t, cur = None, None
        for r in frames["topics"].orderBy(topic, "rank").toLocalIterator():
            if r[topic] != cur_t:
                if cur_t is not None:
                    yield cur_t, cur
                cur_t, cur = r[topic], {}
            cur[r["term"]] = int(r["n_docs"])
        if cur_t is not None:
            yield cur_t, cur

    stream_dict("GlobalTopicsWords_topN.json.gz", topic_entries())

    # BadW per-word map (badwords.go:148): rows arrive doc-clustered
    # after the sort; every value is 1 — see the docstring quirk note
    def badwords_entries():
        # with a stemmer, _tf is stem-keyed: match flagged surface words
        # via their stems and emit the destemmed representative as the
        # BadW key — the word the reference's post-destem flow prints
        if frames["_dictionary"] is not None:
            flagged_df = (
                frames["_dictionary"].join(
                    spark.createDataFrame(
                        [(w,) for w in flagged_terms], "original string"
                    ),
                    "original",
                ).select(F.col("stem").alias("term"), F.col("original").alias("bad_word"))
            )
        else:
            flagged_df = spark.createDataFrame(
                [(w, w) for w in flagged_terms], "term string, bad_word string"
            )
        rows = (
            frames["badwords"]
            .join(
                frames["_tf"].select(doc_id, "term")
                .join(F.broadcast(flagged_df), "term"),
                doc_id,
            )
            .orderBy(doc_id, "bad_word")
        )
        cur_id, cur = None, None
        for r in rows.toLocalIterator():
            if r[doc_id] != cur_id:
                if cur_id is not None:
                    yield cur_id, cur
                cur_id = r[doc_id]
                cur = {"TopicID": r[topic], "Abs": int(r["abs"]), "Rel": r["rel"], "BadW": {}}
            cur["BadW"][r["bad_word"]] = 1
        if cur_id is not None:
            yield cur_id, cur

    stream_dict("BadWordsReport.json.gz", badwords_entries())

    totals = frames["totals"]
    _unpersist_frames(frames)
    return totals


class Exporter:
    """Read API over an exported artifact directory (Q1-Q5)."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.out_dir = out_dir

    @property
    def _doc_id(self) -> str:
        # column name recorded at export time (older sidecars lack it)
        return self.totals().get("doc_id", "doc_id")

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

    def _read_ordered(self, name: str, *order: tuple[str, bool]) -> DataFrame:
        """Read + sort by ``(column, descending)`` pairs, tolerating an
        EMPTY artifact: a JSON write with zero rows has no inferable
        schema, so its sort columns don't resolve — return the (empty,
        schema-less) frame unsorted."""
        df = self._read(name)
        cols = set(df.columns)
        if any(c not in cols for c, _ in order):
            return df
        return df.orderBy(*[F.desc(c) if d else F.asc(c) for c, d in order])

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
        return self._read_ordered(
            GLOBAL_PAGES_TFIDF, (self._doc_id, False), ("rank", False)
        )

    # ---- Q3: topics
    def topics(self) -> DataFrame:
        return self._read(GLOBAL_TOPICS_WORDS)

    # ---- Q4: badwords pages, descending (exporter.go:250)
    def page_badwords(self) -> DataFrame:
        return self._read_ordered(
            BADWORDS_REPORT, ("abs", True), (self._doc_id, False)
        )

    # ---- Q5: delete (exporter.go:56-71)
    def delete(self) -> None:
        for a in (*_ARTIFACTS, TOTALS):
            p = os.path.join(self.out_dir, a)
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
