"""Per-language normalization profiles (operators/normalize.py) vs the
reference's _words_extractor configuration (textnormalizer.pyx:86-176):
min-length table, stopword composition shape, stemmer routing, and the
end-to-end wiring into the tokenizer hooks."""

from __future__ import annotations

import pytest

from wikitfidf_spark.operators import normalize as nz
from wikitfidf_spark.operators.stemdict import STEMMERS


def test_min_word_length_reference_table():
    """textnormalizer.pyx:170-176 — incl. the dead vi==2 branch: vi is
    matched by the first arm, so it is 1 (documented, not replicated)."""
    for lang in ("gan", "ja", "ko", "vi", "wuu", "zh", "zh-classical", "zh-yue"):
        assert nz.min_word_length(lang) == 1, lang
    for lang in ("en", "de", "ar", "fi", "xx", "simple"):
        assert nz.min_word_length(lang) == 3, lang


def test_stopwords_composition_shape():
    """_lang_stopwords parity: english + forbidden always present; the
    italian-dialect family aliases to italian+english; unknown
    languages get the english fallback."""
    en = nz.stopwords_for_lang("en")
    assert set(nz.FORBIDDEN_WORDS) <= en
    assert "the" in en
    # unknown language -> english fallback + forbidden (same shape)
    xx = nz.stopwords_for_lang("xx")
    assert set(nz.FORBIDDEN_WORDS) <= xx and "the" in xx
    # italian-dialect alias resolves without error and includes english
    assert "the" in nz.stopwords_for_lang("pms")


def test_stopwords_guard_corpus_call_not_just_import(monkeypatch):
    """nltk installed WITHOUT `nltk.download('stopwords')` raises
    LookupError at corpus ACCESS — the fallback must catch the call,
    not only the import."""
    import sys
    import types

    corpus = types.ModuleType("nltk.corpus")

    class _Broken:
        def words(self, name):
            raise LookupError("Resource stopwords not found")

    corpus.stopwords = _Broken()
    nltk_mod = types.ModuleType("nltk")
    nltk_mod.corpus = corpus
    monkeypatch.setitem(sys.modules, "nltk", nltk_mod)
    monkeypatch.setitem(sys.modules, "nltk.corpus", corpus)
    sw = nz.stopwords_for_lang("en")
    assert "the" in sw and set(nz.FORBIDDEN_WORDS) <= sw  # shipped fallback


def test_nltk_lang_table_matches_reference_keys():
    """_NLTK_LANG_NAMES must carry EXACTLY the reference's
    _nltk_lang_to_name key set (textnormalizer.pyx:37-84) — a missing
    key (el was once absent) silently downgrades that language to the
    english-only fallback; an extra key (sl was once present) applies
    a stopword list the reference never does."""
    ref_keys = {
        "en", "ar", "da", "nl", "fi", "fr", "de", "el", "hu", "id",
        "it", "kk", "ne", "no", "pt", "ro", "ru", "es", "sv", "tr",
        "hy", "az", "eu", "bn", "bg", "ca", "zh", "sh", "cs", "gl",
        "he", "hi", "ga", "ja", "ko", "lv", "lt", "mr", "fa", "pl",
        "sk", "th", "uk", "ur", "simple",
    }
    assert set(nz._NLTK_LANG_NAMES) == ref_keys
    assert nz._NLTK_LANG_NAMES["el"] == "greek"


def test_reference_forbidden_words_constant():
    """The reference's wiki-markup leak list is exposed verbatim as an
    opt-in (textnormalizer.pyx:33); the engine's default set is the
    code-corpus analogue and deliberately keeps the token 'en'."""
    assert nz.REFERENCE_FORBIDDEN_WORDS == (
        "file", "isbn", "noeditsection", "rowspan", "colspan", "br", "en",
    )
    assert "en" not in nz.FORBIDDEN_WORDS


def test_profile_stemmer_routing():
    p_sv = nz.profile_for_lang("sv")
    assert p_sv.stemmer == "snowball_sv" and p_sv.min_len == 3
    p_zh = nz.profile_for_lang("zh")
    assert p_zh.stemmer is None and p_zh.min_len == 1
    # en routes to nltk's snowball when registered, else to the
    # dependency-free spec-equivalent porter2_en (same algorithm)
    p_en = nz.profile_for_lang("en")
    assert p_en.stemmer in ("porter2_en", "snowball_en")
    # languages with neither an nltk stemmer nor a spec fallback skip
    assert nz.profile_for_lang("fi").stemmer is None


def test_term_frequencies_for_lang_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "the flickorna and flickor xx the"),
            (2, "flicka a bc the klokast"),
        ],
        "doc_id long, content string",
    )
    # swedish: stemmer routes through the Arrow path; stopwords drop
    # 'the'/'and'; min_len 3 drops 'a'/'bc'/'xx'... ('xx' is len 2)
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in nz.term_frequencies_for_lang(docs, "sv").collect()
    }
    assert (1, "flick") in tf and tf[(1, "flick")] == 2  # flickorna+flickor
    assert (2, "flick") in tf
    assert not any(t in ("the", "and", "a", "bc", "xx") for _, t in tf)
    assert STEMMERS["snowball_sv"]("flickorna") == "flick"

    # zh profile: min_len 1 admits single-char identifiers, no stemmer
    # (JVM path), stopwords still drop english+forbidden
    tf_zh = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in nz.term_frequencies_for_lang(docs, "zh").collect()
    }
    assert (2, "a") in tf_zh and (1, "xx") in tf_zh
    assert (1, "flickorna") in tf_zh  # surface form: no stemming for zh
    assert not any(t == "the" for _, t in tf_zh)


@pytest.fixture
def fake_nlp_factory():
    """Duck-typed spaCy pipeline for plumbing tests (the container
    ships no spaCy).  The classes are defined INSIDE the fixture so
    cloudpickle serializes them by value — executors cannot import the
    test module.  pipe() splits on whitespace; tokens ending in '!'
    become non-alpha, ALLCAPS become PUNCT (filtered by POS); lemma =
    surface minus trailing 's'."""

    class Tok:
        def __init__(self, surface, pos="NOUN", alpha=True):
            self.lower_ = surface.lower()
            self.pos_ = pos
            self.is_alpha = alpha
            self.lemma_ = surface.rstrip("s")

    class NLP:
        def pipe(self, texts):
            for t in texts:
                toks = []
                for w in t.split():
                    if w.endswith("!"):
                        toks.append(Tok(w, alpha=False))
                    elif w.isupper():
                        toks.append(Tok(w, pos="PUNCT"))
                    else:
                        toks.append(Tok(w))
                yield toks

    return NLP


def test_lemma_term_frequencies_plumbing(spark, fake_nlp_factory):
    """The spaCy flow's Spark plumbing (mapInPandas, POS filter,
    is_alpha gate, stopword + length clean, lemma counting) runs with
    an injected pipeline — textnormalizer.pyx:325-336 semantics."""
    from wikitfidf_spark.operators.normalize import lemma_term_frequencies

    docs = spark.createDataFrame(
        [
            (1, "walkers walkers walker the AND boom! streets"),
            (2, "walkers streets streets ab"),
        ],
        "doc_id long, content string",
    )
    out = lemma_term_frequencies(docs, "en", nlp_factory=fake_nlp_factory)
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in out.collect()}
    # 'walkers'/'walker' lemma to 'walker'; 'the' is a stopword; 'AND'
    # is PUNCT (POS-filtered; also a stopword); 'boom!' fails is_alpha;
    # 'ab' fails min length 3; 'streets' lemmas to 'street'
    assert rows == {
        (1, "walker"): 3,
        (1, "street"): 1,
        (2, "walker"): 1,
        (2, "street"): 2,
    }


def test_lemma_term_frequencies_nonlemmatable_stems(spark, fake_nlp_factory):
    """Non-lemmatable languages keep lower_ tokens and STEM them —
    exactly the reference's `if not lemmatable: _stemming(...)` branch.
    'vec' routes to a blank pipeline (no lemmas) and has no stemmer, so
    tokens pass through lowercased."""
    from wikitfidf_spark.operators.normalize import (
        lemma_term_frequencies, spacy_model_for_lang,
    )

    assert spacy_model_for_lang("vec") == ("blank:it", False)
    docs = spark.createDataFrame(
        [(7, "Strada strada vecia")], "doc_id long, content string"
    )
    out = lemma_term_frequencies(docs, "vec", nlp_factory=fake_nlp_factory)
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in out.collect()}
    assert rows == {(7, "strada"): 2, (7, "vecia"): 1}


def test_lemma_term_frequencies_requires_spacy():
    """Without spaCy and without an injected factory the flow fails
    fast at the driver with guidance (import-guarded optional dep)."""
    import pytest as _pytest

    try:
        import spacy  # noqa: F401

        _pytest.skip("spacy installed; guard not reachable")
    except ImportError:
        pass
    from wikitfidf_spark.operators.normalize import lemma_term_frequencies

    with _pytest.raises(ImportError, match="spacy"):
        lemma_term_frequencies(None, "en")


def test_index_full_profile_lifecycle(spark, tmp_path):
    """IndexConfig(**index_knobs_for_lang('de')): stopwords drop at
    build, umlaut words tokenize whole and stem, and free-text
    search() analyzes the query through the SAME manifest-carried
    knobs — surface form and stopword-laden queries both behave."""
    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex
    from wikitfidf_spark.operators.normalize import index_knobs_for_lang

    knobs = index_knobs_for_lang("de")
    assert knobs["stemmer"] == "snowball_de"
    assert knobs["min_token_len"] == 3
    assert "the" in knobs["stopwords"]  # english rides every list

    docs = spark.createDataFrame(
        [
            (1, "de", "the abhängen bezeichnung"),
            (2, "de", "bedürfnisse the the abhängen"),
        ],
        "doc_id long, lang string, content string",
    )
    d = str(tmp_path / "idx_profile_de")
    build_index(
        spark, docs, d,
        IndexConfig(n_shards=2, n_salts=2, id_cols=(), **knobs),
        resume=False,
    )
    idx = InvertedIndex(spark, d)
    # the stopword never entered the index
    terms = {r["term"] for r in spark.read.parquet(f"{d}/dictionary.parquet").collect()}
    assert "the" not in terms and "abhang" in terms
    # free-text search: stopword dropped query-side, umlaut form stems
    hits = {r["doc_id"] for r in idx.search("the abhängen").collect()}
    assert hits == {1, 2}
    assert idx.analyze("the abhängen") == ["abhang"]


def test_index_min_len_1_cjk(spark, tmp_path):
    """A zh-profile index (min_token_len=1 + Han letter range) indexes
    single-character words — the reference's CJK branch end-to-end."""
    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex
    from wikitfidf_spark.operators.normalize import index_knobs_for_lang

    knobs = index_knobs_for_lang("zh")
    assert knobs["min_token_len"] == 1
    assert "stemmer" not in knobs  # zh has no stemmer: JVM path fine

    docs = spark.createDataFrame(
        [(1, "zh", "汉 字 分析"), (2, "zh", "分析 字")],
        "doc_id long, lang string, content string",
    )
    d = str(tmp_path / "idx_zh")
    build_index(
        spark, docs, d,
        IndexConfig(n_shards=2, n_salts=2, id_cols=(), **knobs),
        resume=False,
    )
    idx = InvertedIndex(spark, d)
    assert {r["doc_id"] for r in idx.search("字").collect()} == {1, 2}
    assert {r["doc_id"] for r in idx.search("汉").collect()} == {1}


def test_index_full_profile_lifecycle_ar(spark, tmp_path):
    """IndexConfig(**index_knobs_for_lang('ar')): the Arabic profile
    end-to-end — Arabic-script letter class (incl. harakat so vocalized
    words tokenize whole), ISRI stemming to roots at build, and
    free-text search analyzed through the same manifest-carried knobs
    (VERDICT r4 ask #2)."""
    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex
    from wikitfidf_spark.operators.normalize import index_knobs_for_lang

    knobs = index_knobs_for_lang("ar")
    assert knobs["stemmer"] == "isri_ar"
    assert knobs["min_token_len"] == 3
    assert "ء" in knobs["token_letters"]

    docs = spark.createDataFrame(
        [
            (1, "ar", "the الكتاب مدرسة"),
            (2, "ar", "كاتب the مكتبة"),
            (3, "ar", "كَتَبَ درس"),  # vocalized form tokenizes whole
        ],
        "doc_id long, lang string, content string",
    )
    d = str(tmp_path / "idx_profile_ar")
    build_index(
        spark, docs, d,
        IndexConfig(n_shards=2, n_salts=2, id_cols=(), **knobs),
        resume=False,
    )
    idx = InvertedIndex(spark, d)
    terms = {r["term"] for r in spark.read.parquet(f"{d}/dictionary.parquet").collect()}
    assert "the" not in terms        # stopword never entered the index
    assert "كتب" in terms            # surface forms collapsed to the root
    assert "الكتاب" not in terms
    # free-text search analyzes through the config: every k-t-b doc hits
    hits = {r["doc_id"] for r in idx.search("الكتاب").collect()}
    assert hits == {1, 2, 3}
    assert idx.analyze("the الكتاب") == ["كتب"]
