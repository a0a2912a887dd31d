"""Unit tests replicating the reference's own test fixtures
(SURVEY.md §5): TF counting (wordmapperbypage_test.go:10-24), doc length
(pagemapaggregator_test.go:10-28), plus the operator quirks documented
in SURVEY.md §2 (distinct-counting S15/S16, min-by-length S8/S11)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wikitfidf_spark.operators import termstats, topk, stemdict
from wikitfidf_spark.operators.badwords import badwords_report
from wikitfidf_spark.operators.scoring import round_half_up_py, tfidf_py


def test_tf_counting_reference_fixture(spark):
    """wordmapperbypage_test.go:18-19: ["go","go","gopher","lang","code",
    "gopher"] -> {go:2, gopher:2, lang:1, code:1}.  Our tokenizer drops
    words < 3 chars ("go") by the reference's own MIN_WORD_LENGTH=3
    filter (textnormalizer.pyx:170-176), so feed tokens post-filter."""
    docs = spark.createDataFrame(
        [(12345, "gopher golang code gopher lang code")], "doc_id long, content string"
    )
    tf = termstats.term_frequencies(docs)
    got = {r["term"]: r["tf"] for r in tf.collect()}
    assert got == {"gopher": 2, "golang": 1, "code": 2, "lang": 1}


def test_doc_length_reference_fixture(spark):
    """pagemapaggregator_test.go:11-23: freqs {10,50,1,15} -> Tot 76."""
    tf = spark.createDataFrame(
        [(1, "abc", 10), (1, "def", 50), (1, "ghi", 1), (1, "lmn", 15)],
        "doc_id long, term string, tf long",
    )
    assert termstats.doc_lengths(tf).collect()[0]["doc_len"] == 76


def test_global_stats_sentinel_totals(spark):
    """globalwordmapper.go:62-65 sentinels: '@Total Word' = grand token
    count, '@Total Page' = number of docs."""
    tf = spark.createDataFrame(
        [(1, "aaa", 2), (1, "bbb", 3), (2, "aaa", 5)],
        "doc_id long, term string, tf long",
    )
    total_tokens, total_docs = termstats.totals(tf)
    assert (total_tokens, total_docs) == (10, 2)
    stats = {r["term"]: (r["cf"], r["df"]) for r in termstats.global_term_stats(tf).collect()}
    assert stats == {"aaa": (7, 2), "bbb": (3, 1)}


def test_salted_agg_equals_plain(spark, corpus):
    from wikitfidf_spark.corpus import with_doc_id

    tf = termstats.term_frequencies(with_doc_id(corpus))
    plain = {r["term"]: (r["cf"], r["df"]) for r in termstats.global_term_stats(tf).collect()}
    salted = {r["term"]: (r["cf"], r["df"]) for r in termstats.global_term_stats(tf, n_salts=7).collect()}
    assert plain == salted


def test_tfidf_reference_formula():
    """tfidf.go:100-103: tf=freq/Tot, idf=log10(N/df), round half-up 4."""
    assert tfidf_py(2, 10, 1, 100) == round_half_up_py(0.2 * math.log10(100.0), 4)
    assert tfidf_py(1, 4, 2, 8) == round_half_up_py(0.25 * math.log10(4.0), 4)
    # Go math.Round semantics: 0.00005 -> 0.0001 (half away from zero)
    assert round_half_up_py(0.00005, 4) == 0.0001


def test_badwords_distinct_semantics(spark):
    """badwords.go:136-144 iterates map keys: abs counts DISTINCT
    flagged terms, not occurrences; clean docs drop out."""
    tf = spark.createDataFrame(
        [(1, "bad1", 9), (1, "ok", 1), (2, "ok", 5)],
        "doc_id long, term string, tf long",
    )
    dl = termstats.doc_lengths(tf)
    rep = badwords_report(tf, dl, ["bad1", "bad2"]).collect()
    assert len(rep) == 1
    assert rep[0]["doc_id"] == 1 and rep[0]["abs"] == 1  # tf=9 but distinct=1
    assert rep[0]["rel"] == 1 / 10


def test_stem_dict_min_by_length(spark):
    """stemrevaggregator.go:53-61: strictly-shorter wins; our total
    tie-break (len, word)."""
    terms = spark.createDataFrame(
        [("walk9",), ("walk12",), ("walk7",)], "term string"
    )
    d = {r["stem"]: r["original"] for r in stemdict.stem_dict(terms).collect()}
    assert d == {"walk": "walk7"}  # shortest, then lexicographic


def test_topn_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "bbb", 0.5), (1, "aaa", 0.5), (1, "ccc", 0.9)],
        "doc_id long, term string, tfidf double",
    )
    rows = topk.top_n_words_per_doc(df, 2).orderBy("rank").collect()
    assert [r["term"] for r in rows] == ["ccc", "aaa"]  # tie: term asc


def test_topn_recent(spark):
    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00"), (1, 11, "2024-01-03 00:00:00"), (1, 12, "2024-01-02 00:00:00")],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"] for r in topk.top_n_recent_per_group(ev, "user_id", "ts", 2, "event_id").collect()}
    assert got == {11, 12}


def test_semi_filter_long_integer_key_list(spark):
    """S2 semi-join path (>ISIN_MAX keys) must work for non-string key
    columns — the type is inferred from the values, not hardcoded."""
    from wikitfidf_spark.operators import filters

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    keys = list(range(0, 130))  # > ISIN_MAX -> semi-join branch
    got = sorted(r["doc_id"] for r in filters.semi_filter(df, "doc_id", keys).collect())
    assert got == keys


def test_load_flagged_terms_newline_format(tmp_path):
    """S16 list loader parity (badwords.go:50-66): newline-delimited
    words, blanks skipped, order kept, duplicates dropped."""
    from wikitfidf_spark.operators.badwords import load_flagged_terms

    p = tmp_path / "english"
    p.write_text("slow\nerror\n\nlegacy\nslow\n  hack  \n")
    assert load_flagged_terms(str(p)) == ["slow", "error", "legacy", "hack"]


def test_available_language_gate():
    """AvailableLanguage parity (badwords.go:20-48): code -> list name
    including the 'simple'/'cr' test aliases; unknown codes and codes
    whose list file isn't shipped are unavailable."""
    from wikitfidf_spark.operators import badwords as bw

    assert bw.available_language("en") == ("english", True)
    assert bw.available_language("cr") == ("english", True)   # test-mode alias
    assert bw.available_language("simple") == ("english", True)
    assert bw.available_language("it") == ("italian", True)
    assert bw.available_language("xx") == (None, False)       # unknown code
    # a mapped code whose data file is missing reports unavailable
    # (data presence is part of availability — exercised via a dir that
    # lacks the file, since every mapped language now ships data)
    assert bw.available_language("ja", data_dir="/nonexistent") == (None, False)


def test_available_language_full_truth_table():
    """Every code LANGUAGES maps ships a curated (original) word list —
    the map and the data directory are consistent across all 26 codes
    (the reference's 23 mapped codes incl. simple/cr aliases, plus
    eo/ru/tr whose data the reference ships without exposing a code).
    Depth floors: english and the r5-deepened top-5 wiki languages
    (de/fr/es/pt/ru) >= 300 entries, the other majors >= 50, every
    list >= 40; all entries lowercase newline words via the
    reference-format loader."""
    from wikitfidf_spark.operators import badwords as bw

    assert len(bw.LANGUAGES) == 26
    assert {"eo", "ru", "tr"} <= set(bw.LANGUAGES)
    majors = {"en", "es", "fr", "de", "it", "pt", "ru"}
    deep = {"en", "de", "fr", "es", "pt", "ru"}  # r4 ask #6: curated depth
    for code, name in bw.LANGUAGES.items():
        got_name, ok = bw.available_language(code)
        assert (got_name, ok) == (name, True), f"{code} -> {got_name}, {ok}"
        terms = bw.flagged_terms_for_lang(code)
        floor = 300 if code in deep or name == "english" else (
            50 if code in majors else 40)
        assert terms and len(terms) >= floor, f"{name}: {len(terms or [])} terms"
        assert all(t == t.strip() and t == t.lower() for t in terms), name
        assert len(set(terms)) == len(terms), f"{name}: duplicate entries"
    # aliases share the english list
    assert bw.flagged_terms_for_lang("cr") == bw.flagged_terms_for_lang("en")


def test_badwords_report_for_lang_gates_and_loads(spark):
    """The full BadWords flow (badwords.go:69-189): unsupported language
    -> no report at all; supported -> report over the file-loaded list
    with the distinct-term quirk."""
    from wikitfidf_spark.operators import badwords as bw

    tf = spark.createDataFrame(
        [(1, "legacy", 3), (1, "ok", 7), (2, "ok", 5)],
        "doc_id long, term string, tf long",
    )
    dl = termstats.doc_lengths(tf)
    assert bw.badwords_report_for_lang(tf, dl, "xx") is None
    rep = bw.badwords_report_for_lang(tf, dl, "en").collect()
    assert len(rep) == 1
    assert rep[0]["doc_id"] == 1 and rep[0]["abs"] == 1 and rep[0]["rel"] == 0.1
