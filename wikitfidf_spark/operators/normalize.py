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
    "fi": "finnish", "fr": "french", "de": "german", "hu": "hungarian",
    "id": "indonesian", "it": "italian", "kk": "kazakh", "ne": "nepali",
    "no": "norwegian", "pt": "portuguese", "ro": "romanian",
    "ru": "russian", "sl": "slovene", "es": "spanish", "sv": "swedish",
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


def stopwords_for_lang(lang: str) -> frozenset[str]:
    """``_lang_stopwords`` parity (textnormalizer.pyx:86-101): the
    language's list + english + forbidden; english + forbidden when the
    language has no list; italian-dialect aliases.  Uses real NLTK
    lists when importable, the shipped english stand-in otherwise."""
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
    """The three per-language knobs the reference's normalizer sets,
    in engine-hook form."""
    lang: str
    min_len: int
    stopwords: frozenset[str]
    stemmer: str | None  # STEMMERS key for IndexConfig.stemmer, or None


def profile_for_lang(lang: str) -> NormalizationProfile:
    return NormalizationProfile(
        lang=lang,
        min_len=min_word_length(lang),
        stopwords=stopwords_for_lang(lang),
        stemmer=stemmer_for_lang(lang),
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
            stopwords=p.stopwords, min_len=p.min_len,
        )
    from ..tokenize import tf_map_in_pandas
    from .stemdict import STEMMERS

    return tf_map_in_pandas(
        docs, doc_id=doc_id, text=text, extra_cols=extra_cols,
        stem_py=STEMMERS[p.stemmer], stopwords=p.stopwords, min_len=p.min_len,
    )
