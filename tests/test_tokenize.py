"""Tokenizer equality across all implementations + length-filter parity
with the reference (textnormalizer.pyx:170-176)."""

from __future__ import annotations

from collections import Counter

import duckdb

from wikitfidf_spark.operators import termstats
from wikitfidf_spark.tokenize import TOKEN_REGEX, tf_map_in_pandas, tokenize_py


def test_length_bounds():
    assert tokenize_py("ab abc " + "x" * 33 + " " + "y" * 34) == ["abc", "x" * 33, ("y" * 34)[:33]]
    # 34-char identifier: greedy match takes 33, remainder 'y' too short
    assert tokenize_py("_ _a _ab") == ["_ab"]


def test_case_and_digits():
    assert tokenize_py("FooBar baz9 9abc") == ["foobar", "baz9", "abc"]


def test_jvm_equals_arrow_equals_python(spark, corpus, corpus_pdf):
    from wikitfidf_spark.corpus import with_doc_id

    docs = with_doc_id(corpus)
    jvm = termstats.term_frequencies(docs)
    arrow = tf_map_in_pandas(docs)
    a = {(r["doc_id"], r["term"]): r["tf"] for r in jvm.collect()}
    b = {(r["doc_id"], r["term"]): r["tf"] for r in arrow.collect()}
    assert a == b
    ids = docs.select("doc_id", "content").collect()
    c = {}
    for r in ids:
        for t, n in Counter(tokenize_py(r["content"])).items():
            c[(r["doc_id"], t)] = n
    assert a == c


def test_stopword_and_minlen_parity(spark, corpus):
    """The normalization hooks (stopword drop + per-language min token
    length, textnormalizer.pyx:103-109,170-176) produce identical rows
    through all three tokenizer implementations."""
    from wikitfidf_spark.corpus import with_doc_id

    docs = with_doc_id(corpus)
    stop = frozenset({"the", "for", "val"})
    for min_len in (1, 3):
        jvm = termstats.term_frequencies(docs, stopwords=stop, min_len=min_len)
        arrow = tf_map_in_pandas(docs, stopwords=stop, min_len=min_len)
        a = {(r["doc_id"], r["term"]): r["tf"] for r in jvm.collect()}
        b = {(r["doc_id"], r["term"]): r["tf"] for r in arrow.collect()}
        assert a == b, f"min_len={min_len}"
        c = {}
        for r in docs.select("doc_id", "content").collect():
            toks = tokenize_py(r["content"], stopwords=stop, min_len=min_len)
            for t, n in Counter(toks).items():
                c[(r["doc_id"], t)] = n
        assert a == c, f"min_len={min_len}"
        assert not any(t in stop for _, t in a)
    # min_len=1 admits short identifiers that min_len=3 rejects
    assert tokenize_py("a ab abc", min_len=1) == ["a", "ab", "abc"]
    assert tokenize_py("a ab abc", min_len=3) == ["abc"]


def test_duckdb_regex_parity(corpus_pdf):
    con = duckdb.connect()
    con.register("docs", corpus_pdf)
    rows = con.execute(
        f"SELECT content, regexp_extract_all(lower(content), '{TOKEN_REGEX}') FROM docs LIMIT 100"
    ).fetchall()
    for content, toks in rows:
        assert toks == tokenize_py(content)


def test_letters_parity_all_three_paths(spark):
    """The per-language letter-class knob (token grammar widened with
    diacritics / script ranges) produces identical rows through the
    JVM codegen, Arrow, and pure-Python tokenizers — including the
    DuckDB oracle regex (RE2)."""
    import duckdb

    from wikitfidf_spark.operators.normalize import letters_for_lang
    from wikitfidf_spark.tokenize import token_regex

    rows = [
        (1, "Abhängen straße 分析 русский текст naïve"),
        (2, "汉字 café señor łódź abc"),
        (3, "Καλημέρα αυτό ωραίο"),
        (4, "यह वाक्य। १२३ สวัสดี ๑๒๓"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    for lang, min_len in (
        ("de", 3), ("zh", 1), ("ru", 3), ("fr", 3), ("el", 3), ("hi", 1), ("th", 1)
    ):
        letters = letters_for_lang(lang)
        jvm = termstats.term_frequencies(docs, letters=letters, min_len=min_len)
        arrow = tf_map_in_pandas(docs, letters=letters, min_len=min_len)
        a = {(r["doc_id"], r["term"]): r["tf"] for r in jvm.collect()}
        b = {(r["doc_id"], r["term"]): r["tf"] for r in arrow.collect()}
        assert a == b, lang
        c = {}
        for did, text in rows:
            for t, n in Counter(
                tokenize_py(text, letters=letters, min_len=min_len)
            ).items():
                c[(did, t)] = n
        assert a == c, lang
        # DuckDB RE2 agrees on the same pattern (oracle-expressible)
        pat = token_regex(min_len, letters=letters)
        d = {}
        for did, text in rows:
            toks = duckdb.sql(
                "select unnest(regexp_extract_all(lower(?), ?)) t", params=[text, pat]
            ).fetchall()
            for t, n in Counter(x[0] for x in toks).items():
                d[(did, t)] = n
        assert a == d, lang
    # the German class tokenizes umlaut words whole; ASCII splits them
    assert tokenize_py("abhängen", letters=letters_for_lang("de")) == ["abhängen"]
    assert tokenize_py("abhängen") == ["abh", "ngen"]
    # Greek accented vowels stay inside the word (tonos on most words)
    assert tokenize_py("καλημέρα αυτό", letters=letters_for_lang("el")) == [
        "καλημέρα", "αυτό"
    ]
    # script-local digits and punctuation stay OUT of the class
    assert tokenize_py("वाक्य। १२३", min_len=1, letters=letters_for_lang("hi")) == ["वाक्य"]
    assert tokenize_py("ไทย ๑๒๓ ฿", min_len=1, letters=letters_for_lang("th")) == ["ไทย"]
