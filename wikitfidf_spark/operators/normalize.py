"""Per-language normalization profiles — the reference's
``_words_extractor`` configuration surface, composed from the engine's
pluggable hooks.

The reference normalizes per language inside one Cython flow
(``/root/reference/internal/textnormalizer/textnormalizer.pyx``):

- stopwords = NLTK language list + english + FORBIDDEN_WORDS
  (``_lang_stopwords``, :86-101; english+forbidden when the language
  has no NLTK list; the italian-dialect family co/eml/fur/… aliases to
  italian+english, :92-93)
- minimum token length = 1 for Han/Hang/Hant-script languages, else 3
  (``_get_min_word_length``, :170-176 — including its dead ``vi == 2``
  branch: ``vi`` is already matched by the first arm, documented here
  rather than replicated as behavior)
- stemmer = Snowball for the 14-language list, ISRI for Arabic, None
  otherwise (``_get_stemmer``, :112-121)

This module maps a language code to the SAME three knobs and feeds them
to the engine's tokenizer hooks (:func:`wikitfidf_spark.tokenize.tokens_col`
``stopwords``/``min_len``; ``IndexConfig.stemmer``).  Everything is
data-driven and import-guarded: real NLTK stopword lists are used when
the library is installed; otherwise the shipped original english list +
the forbidden set stand in (exactly the reference's fallback shape for
unsupported languages).
"""

from __future__ import annotations

from dataclasses import dataclass

from .stemdict import stemmer_for_lang

#: reference: words leaked by wiki markup (textnormalizer.pyx:33).
#: Code-corpus analogue (original list): tokens leaked by code "markup"
#: — license boilerplate, urls, shebangs — that carry no signal.
FORBIDDEN_WORDS: tuple[str, ...] = (
    "http", "https", "www", "com", "org", "span", "nbsp", "amp",
)

#: the reference's own wiki-markup leak list (textnormalizer.pyx:33),
#: exposed as an opt-in constant for wiki-corpus runs that must match
#: reference artifacts exactly (it drops ``en`` from every corpus;
#: this engine's default set deliberately does not).
REFERENCE_FORBIDDEN_WORDS: tuple[str, ...] = (
    "file", "isbn", "noeditsection", "rowspan", "colspan", "br", "en",
)

#: original minimal english stopword list (fallback when nltk is
#: absent; the reference always has nltk, so this is the documented
#: sandbox stand-in, not a claim of NLTK-list parity)
EN_STOPWORDS: tuple[str, ...] = (
    "the", "and", "for", "are", "but", "not", "you", "all", "any",
    "can", "had", "her", "was", "one", "our", "out", "has", "him",
    "his", "how", "its", "may", "new", "now", "old", "see", "two",
    "way", "who", "did", "get", "use", "that", "this", "with", "have",
    "from", "they", "been", "were", "said", "each", "which", "their",
    "will", "would", "there", "what", "about", "when", "into", "than",
    "them", "then", "some", "these", "also", "such",
)

#: Han/Hang/Hant-script languages where a single character is a word —
#: the reference's min-length-1 set (textnormalizer.pyx:170-173).  The
#: reference also lists ``vi`` here AND in a dead ``== 2`` branch
#: (:174-175); the first match wins there, so vi is 1.
MIN_LEN_1_LANGS = frozenset(
    {"gan", "ja", "ko", "vi", "wuu", "zh", "zh-classical", "zh-yue"}
)

#: italian-dialect family that aliases to italian stopwords
#: (textnormalizer.pyx:92-93)
IT_DIALECTS = frozenset(
    {"co", "eml", "fur", "lij", "lmo", "nap", "pms", "sc", "scn", "roa-tara", "vec"}
)

#: reference's NLTK language-name table (textnormalizer.pyx:36-84),
#: used to decide whether a language HAS a stopword list
_NLTK_LANG_NAMES = {
    "en": "english", "ar": "arabic", "da": "danish", "nl": "dutch",
    "fi": "finnish", "fr": "french", "de": "german", "el": "greek",
    "hu": "hungarian",
    "id": "indonesian", "it": "italian", "kk": "kazakh", "ne": "nepali",
    "no": "norwegian", "pt": "portuguese", "ro": "romanian",
    "ru": "russian", "es": "spanish", "sv": "swedish",
    "tr": "turkish", "hy": "armenian", "az": "azerbaijani",
    "eu": "basque", "bn": "bengali", "bg": "bulgarian", "ca": "catalan",
    "zh": "chinese", "sh": "croatian", "cs": "czech", "gl": "galician",
    "he": "hebrew", "hi": "hindi", "ga": "irish", "ja": "japanese",
    "ko": "korean", "lv": "latvian", "lt": "lithuanian", "mr": "marathi",
    "fa": "persian", "pl": "polish", "sk": "slovak", "th": "thai",
    "uk": "ukrainian", "ur": "urdu", "simple": "english",
}


def min_word_length(lang: str) -> int:
    """``_get_min_word_length`` parity (textnormalizer.pyx:170-176)."""
    return 1 if lang in MIN_LEN_1_LANGS else 3


#: per-language letter-class extensions for the token grammar.  The
#: reference tokenizes unicode word characters; the engine's default
#: grammar is ASCII (the code corpus), so natural-language profiles
#: widen the class per language.  Classes are lowercase (matching runs
#:  on lowercased text); Java regex, RE2 and Python ``re`` all accept
#: literal unicode chars and ranges identically.
_LATIN_EXT = {
    "de": "a-zäöüß",
    "sv": "a-zäåö",
    "da": "a-zæøå", "no": "a-zæøå",
    "fi": "a-zäöå",
    "fr": "a-zàâæçéèêëîïôœùûüÿ",
    "es": "a-záéíóúüñ", "gl": "a-záéíóúüñ", "ca": "a-zàéèíïóòúüç",
    "pt": "a-zàáâãçéêíóôõú",
    "it": "a-zàèéìíîòóùú",
    "ro": "a-zăâîșşțţ",
    "hu": "a-záéíóöőúüű",
    "tr": "a-zçğıöşü",
    "cs": "a-záčďéěíňóřšťúůýž", "sk": "a-záäčďéíĺľňóôŕšťúýž",
    "pl": "a-ząćęłńóśźż",
    "nl": "a-zéèëïĳ",
    "az": "a-zçəğıöşü", "eu": "a-zñ", "ga": "a-záéíóú",
    "lv": "a-zāčēģīķļņšūž", "lt": "a-ząčęėįšųūž",
    "sl": "a-zčšž", "sh": "a-zčćđšž",
}

#: script ranges for non-Latin alphabets (the min-len-1 CJK family plus
#: the reference's other stopword-table scripts).  Ranges cover letters
#: + combining vowel signs but EXCLUDE script-local digits and
#: punctuation (Devanagari danda, Thai baht/repetition marks), and
#: Greek includes the tonos-accented vowels (U+0390, U+03AC-03CE) —
#: without them every accented word would split at its accent
_SCRIPT_LETTERS = {
    "ru": "a-zа-яё", "uk": "a-zа-щьюяєіїґ", "bg": "a-zа-я", "kk": "a-zа-яёәғқңөұүһі",
    # ar includes the harakat/tanwin combining marks (U+064B-0652) so
    # vocalized words tokenize whole \u2014 the ISRI stemmer strips them
    # inside the token (isri_ar.stem step 1), mirroring nltk's
    # tokenize-keeps / stemmer-strips split.  fa/ur have NO stemmer
    # route, so their classes stop at the letters (U+0621-064A): with
    # nothing downstream to fold a vocalized form onto its bare form,
    # keeping harakat would index e.g. Urdu \u06a9\u0650\u062a\u0627\u0628 as a term containing
    # U+0650 that the unvocalized query \u06a9\u062a\u0627\u0628 can never match \u2014
    # splitting at the (rare) diacritic is consistent on both sides
    "ar": "a-z\u0621-\u0652", "fa": "a-z\u0621-\u064a\u067e\u0686\u0698\u06a9\u06af\u06cc",
    "ur": "a-z\u0621-\u064a\u0679\u067e\u0686\u0688\u0691\u0698\u06a9\u06af\u06ba\u06be\u06c1\u06cc\u06d2",
    "he": "a-z\u05d0-\u05ea",
    "hy": "a-z\u0561-\u0587", "el": "a-z\u0390\u03ac-\u03ce",
    "hi": "a-z\u0900-\u0963\u0971-\u097f", "mr": "a-z\u0900-\u0963\u0971-\u097f", "ne": "a-z\u0900-\u0963\u0971-\u097f",
    "bn": "a-z\u0980-\u09e3\u09f0-\u09f1", "th": "a-z\u0e01-\u0e3a\u0e40-\u0e45\u0e47-\u0e4e",
    "zh": "a-z\u4e00-\u9fff", "zh-classical": "a-z\u4e00-\u9fff",
    "zh-yue": "a-z\u4e00-\u9fff", "gan": "a-z\u4e00-\u9fff",
    "wuu": "a-z\u4e00-\u9fff",
    "ja": "a-z\u3040-\u30ff\u4e00-\u9fff",
    "ko": "a-z\uac00-\ud7af\u1100-\u11ff",
    "vi": "a-zàáâãèéêìíòóôõùúýăđĩũơưạ-ỹ",
}


def letters_for_lang(lang: str) -> str:
    """Letter-class body of the token grammar for a language: the ASCII
    default widened by the language's Latin diacritics or script range.
    Unknown languages keep the ASCII class (the engine's code-corpus
    grammar) — widening is per-language data, not a behavior change."""
    return _SCRIPT_LETTERS.get(lang) or _LATIN_EXT.get(lang, "a-z")


def stopwords_for_lang(lang: str) -> frozenset[str]:
    """``_lang_stopwords`` structure (textnormalizer.pyx:86-101): the
    language's list + english + forbidden; english + forbidden when the
    language has no list; italian-dialect aliases.  Uses real NLTK
    lists when importable, the shipped english stand-in otherwise.

    Deliberate deviation: the forbidden set is :data:`FORBIDDEN_WORDS`
    (code-corpus boilerplate tokens), NOT the reference's wiki-markup
    list — notably the reference drops the token ``en`` from every
    corpus and this engine keeps it.  For exact-output comparison
    against reference artifacts, pass
    :data:`REFERENCE_FORBIDDEN_WORDS` to the tokenizer instead."""
    try:
        from nltk.corpus import stopwords as _sw
    except Exception:
        _sw = None

    def words(name: str) -> list[str]:
        # guard the CALL too, not just the import: nltk installed
        # without `nltk.download('stopwords')` raises LookupError at
        # corpus access, and some nltk_data versions lack individual
        # language files — every miss falls back to the shipped list
        if _sw is not None:
            try:
                return list(_sw.words(name))
            except Exception:
                pass
        return list(EN_STOPWORDS) if name == "english" else []

    en = words("english")
    if lang in IT_DIALECTS:
        return frozenset(words("italian") + en + list(FORBIDDEN_WORDS))
    name = _NLTK_LANG_NAMES.get(lang)
    lang_words = words(name) if name else []
    return frozenset(lang_words + en + list(FORBIDDEN_WORDS))


@dataclass(frozen=True)
class NormalizationProfile:
    """The per-language knobs the reference's normalizer sets, in
    engine-hook form."""
    lang: str
    min_len: int
    stopwords: frozenset[str]
    stemmer: str | None  # STEMMERS key for IndexConfig.stemmer, or None
    letters: str = "a-z"  # token-grammar letter class (tokenize.token_regex)


def profile_for_lang(lang: str) -> NormalizationProfile:
    return NormalizationProfile(
        lang=lang,
        min_len=min_word_length(lang),
        stopwords=stopwords_for_lang(lang),
        stemmer=stemmer_for_lang(lang),
        letters=letters_for_lang(lang),
    )


def term_frequencies_for_lang(docs, lang: str, *, doc_id: str = "doc_id",
                              text: str = "content", extra_cols: tuple[str, ...] = ()):
    """Language-normalized per-doc term frequencies: one call wiring
    the profile into the engine's tokenizer hooks.  Uses the JVM
    codegen path when the profile has no stemmer; the fused Arrow path
    (tf_map_in_pandas) when stemming is required (a Python stemmer
    can't run in the JVM expression)."""
    p = profile_for_lang(lang)
    if p.stemmer is None:
        from . import termstats

        return termstats.term_frequencies(
            docs, doc_id=doc_id, text=text, extra_cols=extra_cols,
            stopwords=p.stopwords, min_len=p.min_len, letters=p.letters,
        )
    from ..tokenize import tf_map_in_pandas
    from .stemdict import STEMMERS

    return tf_map_in_pandas(
        docs, doc_id=doc_id, text=text, extra_cols=extra_cols,
        stem_py=STEMMERS[p.stemmer], stopwords=p.stopwords, min_len=p.min_len,
        letters=p.letters,
    )


# ---------------------------------------------------------------------------
# spaCy lemmatization flow (textnormalizer.pyx:151-167, 325-336)
# ---------------------------------------------------------------------------

#: reference's allowed part-of-speech tags (textnormalizer.pyx:29) —
#: lemmatizable languages keep ONLY these tokens
ALLOWED_POS = frozenset({"ADJ", "ADV", "NOUN", "PROPN", "VERB"})

#: ``_get_nlp_processor`` parity (textnormalizer.pyx:151-167): language
#: -> (spaCy model name, lemmatable).  Blank pipelines tokenize without
#: lemmas (the reference then falls back to stemming).
_SPACY_LEMMA_LANGS = frozenset(
    {"ca", "da", "de", "el", "es", "fr", "it", "lt", "mk", "nl", "pl", "pt", "ro", "ru"}
)
_IT_BLANK_LANGS = frozenset(
    {"eml", "fur", "lij", "la", "lmo", "nap", "pms", "sc", "scn", "roa-tara", "vec"}
)


def spacy_model_for_lang(lang: str) -> tuple[str, bool]:
    """(model name, lemmatable) per the reference's table.  Blank
    pipelines are named ``blank:<lang>``."""
    if lang in ("en", "simple"):
        return "en_core_web_sm", True
    if lang in _SPACY_LEMMA_LANGS:
        return f"{lang}_core_news_sm", True
    if lang == "ja":
        return "ja_core_news_sm", False
    if lang == "zh":
        return "zh_core_web_sm", False
    if lang == "no":
        return "nb_core_news_sm", True
    if lang in _IT_BLANK_LANGS:
        return "blank:it", False
    return "blank:xx", False


_SPACY_CACHE: dict = {}


def _load_spacy(model_name: str):
    """Worker-side spaCy load (memoized per process — one model per
    executor, shared across Arrow batches).  Import-guarded: callers
    hand a clear error to users without the optional dependency."""
    cache = _SPACY_CACHE
    nlp = cache.get(model_name)
    if nlp is None:
        import spacy  # optional dependency, never imported at module load

        if model_name.startswith("blank:"):
            nlp = spacy.blank(model_name.split(":", 1)[1])
        else:
            nlp = spacy.load(
                model_name, exclude=["parser", "ner", "textcat", "custom"]
            )
        cache[model_name] = nlp
    return nlp


def lemma_term_frequencies(
    docs,
    lang: str,
    *,
    doc_id: str = "doc_id",
    text: str = "content",
    nlp_factory=None,
):
    """Per-doc term frequencies through the reference's spaCy flow
    (textnormalizer.pyx:325-336): ``nlp.pipe`` the batch, keep
    ``lemma_`` for ALLOWED_POS alphabetic tokens when the language's
    model lemmatizes (else ``lower_`` for alphabetic tokens), clean
    with the language's stopwords + length band (``_words_cleaner``,
    :107-109), and — exactly like the reference — stem only the
    NON-lemmatable branch.  Deviation (documented): lemmas are
    lowercased to fit the engine's lowercase term space; the reference
    keeps spaCy's lemma case.

    Spark-side plumbing is real and tested with an injected
    ``nlp_factory`` (a zero-arg callable returning an object with
    ``.pipe(texts)`` yielding token sequences carrying ``lemma_``,
    ``pos_``, ``is_alpha``, ``lower_``); the spaCy path itself is
    import-guarded — this container ships no spaCy models, so the
    default factory raises ImportError with guidance at the driver
    (before any job runs) when spacy is absent."""
    from collections import Counter

    import pandas as pd

    from ..tokenize import MAX_TOKEN_LEN

    model_name, lemmatable = spacy_model_for_lang(lang)
    if nlp_factory is None:
        try:
            import spacy  # noqa: F401 — fail fast on the driver
        except ImportError as e:
            raise ImportError(
                "lemma_term_frequencies needs the optional spacy dependency "
                f"(model {model_name!r}); install spacy + the model, or pass "
                "nlp_factory"
            ) from e

        def nlp_factory():
            return _load_spacy(model_name)

    stop = stopwords_for_lang(lang)
    min_len = min_word_length(lang)
    stem_key = stemmer_for_lang(lang) if not lemmatable else None
    id_type = docs.schema[doc_id].dataType.simpleString()
    out_schema = f"`{doc_id}` {id_type}, term string, tf long"

    def fn(batches):
        nlp = nlp_factory()
        stem = None
        if stem_key is not None:
            from .stemdict import STEMMERS

            stem = STEMMERS[stem_key]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, terms, tfs = [], [], []
            texts = pdf[text].fillna("").tolist()
            for did, doc in zip(pdf[doc_id], nlp.pipe(texts)):
                if lemmatable:
                    toks = [w.lemma_ for w in doc if w.pos_ in ALLOWED_POS and w.is_alpha]
                else:
                    toks = [w.lower_ for w in doc if w.is_alpha]
                toks = [
                    t.lower() for t in toks
                    if t.lower() not in stop and min_len <= len(t) <= MAX_TOKEN_LEN
                ]
                if stem is not None:
                    memo: dict[str, str] = {}
                    stemmed = []
                    for t in toks:
                        r = memo.get(t)
                        if r is None:
                            r = memo[t] = stem(t)
                        stemmed.append(r)
                    toks = stemmed
                for t, n in Counter(toks).items():
                    ids.append(did)
                    terms.append(t)
                    tfs.append(n)
            yield pd.DataFrame({doc_id: ids, "term": terms, "tf": tfs})

    return docs.select(doc_id, text).mapInPandas(fn, schema=out_schema)


def index_knobs_for_lang(lang: str) -> dict:
    """IndexConfig kwargs for a language's full normalization profile —
    ``IndexConfig(n_shards=..., **index_knobs_for_lang("de"))`` builds
    an index whose WHOLE lifecycle (build, add, merge, free-text
    ``search``) tokenizes with the language's letter class, min token
    length, stopwords and stemmer.  Stemming needs the Arrow tokenizer
    (a Python stemmer can't run in the JVM expression), so the
    tokenizer knob rides along when a stemmer routes."""
    p = profile_for_lang(lang)
    knobs: dict = {
        "token_letters": p.letters,
        "min_token_len": p.min_len,
        "stopwords": tuple(sorted(p.stopwords)),
    }
    if p.stemmer is not None:
        knobs["stemmer"] = p.stemmer
        knobs["tokenizer"] = "arrow"
    return knobs
