"""Exporter artifacts: write -> validate -> read-back parity (reference
S20 + Q1-Q5, exporter.go)."""

from __future__ import annotations

import gzip
import glob
import os

import pytest
from pyspark.sql import functions as F

from wikitfidf_spark import exporter as ex
from wikitfidf_spark.operators.scoring import tfidf_py
from wikitfidf_spark.tokenize import term_counts_py

DOCS = [
    (1, "python", "alpha beta beta gamma slow"),
    (2, "python", "alpha alpha delta error error"),
    (3, "go", "beta gamma gamma gamma epsilon"),
    (4, "go", "clean words only here today"),
]
FLAGGED = ["slow", "error"]


@pytest.fixture(scope="module")
def out_dir(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    d = str(tmp_path_factory.mktemp("artifacts"))
    totals = ex.export_artifacts(spark, docs, d, FLAGGED, ex.Limits(words_pages=3, global_words=4, topic_words=2))
    assert totals["total_docs"] == 4
    return d


def test_from_dir_validates(spark, out_dir):
    ex.Exporter.from_dir(spark, out_dir)  # ok
    with pytest.raises(FileNotFoundError):
        ex.Exporter.from_dir(spark, "/tmp/definitely_missing_artifacts")


def test_artifacts_are_gzip_jsonl(out_dir):
    parts = glob.glob(os.path.join(out_dir, ex.GLOBAL_WORDS, "*.json.gz"))
    assert parts, "expected gzip part files"
    with gzip.open(parts[0], "rt") as f:
        first = f.readline()
    assert first.strip().startswith("{")


def test_global_words_top_by_cf(spark, out_dir):
    got = {r["term"]: r["cf"] for r in ex.Exporter.from_dir(spark, out_dir).global_words().collect()}
    # cf over all docs: gamma 4, alpha 3, beta 3, error 2 (top-4 by cf desc, term asc)
    assert got == {"gamma": 4, "alpha": 3, "beta": 3, "error": 2}


def test_pages_topn_matches_pure_python_tfidf(spark, out_dir):
    pages = ex.Exporter.from_dir(spark, out_dir).pages().collect()
    # doc 1 counts: alpha1 beta2 gamma1 slow1, doc_len 5
    tfs = term_counts_py("alpha beta beta gamma slow")
    dfs = {"alpha": 2, "beta": 2, "gamma": 2, "slow": 1, "delta": 1, "error": 1,
           "epsilon": 1, "clean": 1, "words": 1, "only": 1, "here": 1, "today": 1}
    exp = sorted(
        ((t, tfidf_py(c, 5, dfs[t], 4)) for t, c in tfs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    got = [(r["term"], r["tfidf"]) for r in pages if r["doc_id"] == 1]
    assert got == exp


def test_topics_per_topic_limit(spark, out_dir):
    topics = ex.Exporter.from_dir(spark, out_dir).topics().collect()
    by_topic = {}
    for r in topics:
        by_topic.setdefault(r["lang"], []).append(r)
    assert set(by_topic) == {"python", "go"}
    assert all(len(v) <= 2 for v in by_topic.values())


def test_page_badwords_distinct_semantics(spark, out_dir):
    rep = {r["doc_id"]: (r["abs"], r["rel"]) for r in ex.Exporter.from_dir(spark, out_dir).page_badwords().collect()}
    # doc 2: flagged types {error} -> abs=1 (distinct, not 2 occurrences); doc_len 5
    assert rep[2] == (1, 1 / 5)
    assert rep[1] == (1, 1 / 5)
    assert 3 not in rep and 4 not in rep  # no flagged terms -> dropped (inner join)


def test_delete(spark, out_dir):
    e = ex.Exporter.from_dir(spark, out_dir)
    e.delete()
    with pytest.raises(FileNotFoundError):
        ex.Exporter.from_dir(spark, out_dir)


def test_compat_artifacts_reference_shapes(spark, tmp_path):
    """write_compat_artifacts: single gzip file per artifact, valid
    JSON, reference shapes (flat {word: cf}; {doc: {TopicID, Tot,
    Words}}; {topic: {word: n}}; {doc: {TopicID, Abs, Rel}}) — the
    drop-in format for consumers of the reference's files."""
    import json

    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    d = str(tmp_path / "compat")
    ex.write_compat_artifacts(
        spark, docs, d, FLAGGED,
        ex.Limits(words_pages=3, global_words=4, topic_words=2),
    )

    def load(name):
        with gzip.open(os.path.join(d, name)) as f:
            return json.load(f)

    words = load("GlobalWords_topN.json.gz")
    # flat {word: cf}, top-4 by collection frequency
    assert len(words) == 4 and words["gamma"] == 4 and words["alpha"] == 3

    pages = load("GlobalPagesTFIDF_topN.json.gz")
    assert set(pages) == {"1", "2", "3", "4"}
    p1 = pages["1"]
    assert p1["TopicID"] == "python" and p1["Tot"] == 5
    assert len(p1["Words"]) == 3  # words_pages limit
    exp = tfidf_py(2, 5, 2, 4)  # beta: tf=2, doc_len=5, df=2, N=4
    assert p1["Words"]["beta"] == exp

    topics = load("GlobalTopicsWords_topN.json.gz")
    assert set(topics) == {"python", "go"}
    assert all(len(w) <= 2 for w in topics.values())  # topic_words limit
    # docs-in-topic-containing semantics: alpha is in both python docs
    assert topics["python"]["alpha"] == 2
    assert topics["go"] == {"beta": 1, "clean": 1}  # all-ties -> term asc

    bad = load("BadWordsReport.json.gz")
    assert set(bad) == {"1", "2"}  # clean docs drop out
    # BadW values are always 1 (reference's dead-code ++ branch,
    # badwords.go:135-143): doc 2 has 'error' twice but counts once
    assert bad["2"] == {"TopicID": "python", "Abs": 1, "Rel": 0.2, "BadW": {"error": 1}}
    assert bad["1"]["BadW"] == {"slow": 1}


def test_export_artifacts_with_lang_profile(spark, tmp_path):
    """export_artifacts(lang='de') runs one reference-shaped
    per-language pipeline invocation: the profile's stopwords drop on
    the surface token, umlaut words tokenize whole (letter class),
    stem through snowball_de, and destem back to the shortest surface
    form in the word artifacts."""
    docs = spark.createDataFrame(
        [
            (1, "de", "the abhängen abhängen bezeichnung"),
            (2, "de", "bedürfnisse the abhängen flags"),
        ],
        "doc_id long, lang string, text string",
    )
    out = str(tmp_path / "artifacts_de")
    # flagged lists are SURFACE words (the reference matches them
    # against the destemmed representative, post-destem — so the list
    # rides through the stem dictionary, not straight onto stems)
    ex.export_artifacts(spark, docs, out, ["abhängen"], lang="de")
    exp = ex.Exporter.from_dir(spark, out)

    gw = {r["term"]: r["cf"] for r in exp.global_words().collect()}
    assert "the" not in gw                 # profile stopword dropped
    # stem 'abhang' (cf 3) destems to the only surface form
    assert gw["abhängen"] == 3
    assert "abhang" not in gw
    # flagged surface word -> its stem -> every doc containing any
    # surface form of that stem
    flagged = {r["doc_id"] for r in exp.page_badwords().collect()}
    assert flagged == {1, 2}

    # explicit stem_py overrides the profile stemmer
    out2 = str(tmp_path / "artifacts_de_id")
    ex.export_artifacts(
        spark, docs, out2, [], lang="de", stem_py=lambda t: t
    )
    exp2 = ex.Exporter.from_dir(spark, out2)
    gw2 = {r["term"]: r["cf"] for r in exp2.global_words().collect()}
    assert gw2["abhängen"] == 3 and "the" not in gw2


def test_exporter_custom_doc_id_and_empty_badwords(spark, tmp_path):
    """The read API resolves the doc_id column recorded at export time
    (a non-default name previously crashed pages()/page_badwords()),
    and tolerates an EMPTY badwords artifact (zero rows -> schema-less
    JSON relation with unresolvable sort columns)."""
    docs = spark.createDataFrame(
        [(10, "en", "alpha beta beta"), (11, "en", "gamma alpha")],
        "page_id long, lang string, text string",
    )
    out = str(tmp_path / "artifacts_pageid")
    ex.export_artifacts(spark, docs, out, [], doc_id="page_id")
    exp = ex.Exporter.from_dir(spark, out)
    pages = exp.pages().collect()
    assert {r["page_id"] for r in pages} == {10, 11}
    assert exp.page_badwords().count() == 0  # empty artifact, no crash
