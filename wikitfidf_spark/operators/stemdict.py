"""Stem-reverse dictionary (reference S8 + S11).

The reference remembers, per stem, the shortest original word seen
(strictly-shorter replaces, ties keep first — textnormalizer.pyx:124-139,
stemrevaggregator.go:53-61).  "Ties keep first" is arrival-order
dependent; we make it total with (length asc, word asc) —
SURVEY.md §2 S8's documented determinism fix.

For the code corpus there is no linguistic stemmer; the default stem
function is a deterministic prefix (identifier root before the last
``_<digits>`` suffix, else the first segment), enough to exercise the
min-by-length merge semantics and the S14 de-stemming join.

Pluggable stemmers: the reference stems with Snowball/ISRI and
lemmatizes via spaCy (textnormalizer.pyx:112-136) — libraries absent
from this container.  Any plain ``str -> str`` callable plugs into the
same merge/destem machinery: :func:`column_stemmer` lifts it to a
Column function via an Arrow-batched pandas UDF (per-batch memoized —
no per-row Python at the JVM boundary), and the :data:`STEMMERS`
registry names stemmers so ``IndexConfig``/manifests stay
JSON-serializable.  ``porter2_en`` (:mod:`.porter2`) is a full
dependency-free Snowball-English implementation — the same algorithm
the reference's nltk ``SnowballStemmer("english")`` runs;
:func:`snowball_lite` remains a cheap table-driven stand-in used by
fast tests.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def default_stem(term: Column) -> Column:
    """Strip a trailing digit run, else keep the term; deterministic and
    expressible in both Spark and DuckDB (regexp_replace)."""
    return F.regexp_replace(term, "[0-9]+$", "")


# longest-match-first: a fixed public-knowledge English suffix table
_SUFFIXES = (
    "ational", "ization", "iveness", "fulness", "ousness", "tional",
    "ements", "ment", "ness", "tions", "tion", "sion", "ings", "ing",
    "edly", "ied", "ies", "ed", "ly", "es", "s",
)


def snowball_lite(word: str) -> str:
    """Deterministic English suffix-stripper (Snowball-shaped, not
    Snowball): removes the longest matching suffix from a fixed table
    when ≥ 3 characters of stem remain.  Stands in for the reference's
    Snowball/ISRI stemmers (textnormalizer.pyx:112-136); swap in a real
    one (nltk SnowballStemmer(...).stem) on a cluster that has it."""
    for suf in _SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: len(word) - len(suf)]
    return word


from .isri_ar import stem as isri_ar
from .porter2 import porter2_en
from .snowball_de import snowball_de
from .snowball_sv import snowball_sv

#: named stemmers usable from JSON-serializable config (IndexConfig.stemmer).
#: ``porter2_en`` (full Snowball English, :mod:`.porter2`),
#: ``snowball_sv`` (full Snowball Swedish, :mod:`.snowball_sv`),
#: ``snowball_de`` (full Snowball German, :mod:`.snowball_de`) and
#: ``isri_ar`` (ISRI Arabic, :mod:`.isri_ar`) are dependency-free spec
#: implementations: the Snowball three match what the reference's nltk
#: SnowballStemmer("english"/"swedish"/"german") computes (published
#: spec = published implementation), and ``isri_ar`` implements the
#: Taghva et al. 2005 affix/pattern algorithm — its curated
#: function-word guard list may differ at the margins from nltk
#: ISRIStemmer's unpublished-in-the-paper stop list (see
#: :data:`.isri_ar._FUNCTION_WORDS`); ``snowball_lite`` remains the
#: cheap table-driven stand-in.
#: Pre-registered spec implementations keep their keys even when nltk
#: is installed (register_nltk_stemmers only fills missing keys —
#: deterministic behavior regardless of environment).
STEMMERS: dict[str, Callable[[str], str]] = {
    "snowball_lite": snowball_lite,
    "porter2_en": porter2_en,
    "snowball_sv": snowball_sv,
    "snowball_de": snowball_de,
    "isri_ar": isri_ar,
}

#: the reference's Snowball language set (textnormalizer.pyx:113-115),
#: mapped to nltk's SnowballStemmer constructor names
_SNOWBALL_LANGS: dict[str, str] = {
    "en": "english", "da": "danish", "nl": "dutch", "fr": "french",
    "de": "german", "es": "spanish", "hu": "hungarian", "it": "italian",
    "simple": "english", "no": "norwegian", "pt": "portuguese",
    "ro": "romanian", "ru": "russian", "sv": "swedish",
}


def register_nltk_stemmers(registry: dict[str, Callable[[str], str]] = STEMMERS) -> list[str]:
    """Register real linguistic stemmers when ``nltk`` is importable:
    ``snowball_<code>`` per reference-supported language plus
    ``isri_ar`` for Arabic — exactly the reference's ``_get_stemmer``
    table (textnormalizer.pyx:112-121).  Import-guarded no-op (returns
    ``[]``) when nltk is absent, leaving :func:`snowball_lite` as the
    documented stand-in.  Returns the keys added (idempotent)."""
    try:
        from nltk.stem.snowball import SnowballStemmer
    except Exception:
        return []
    added: list[str] = []
    for code, name in _SNOWBALL_LANGS.items():
        key = f"snowball_{code}"
        if key not in registry:
            registry[key] = SnowballStemmer(name).stem
            added.append(key)
    try:
        from nltk.stem.isri import ISRIStemmer

        if "isri_ar" not in registry:
            registry["isri_ar"] = ISRIStemmer().stem
            added.append("isri_ar")
    except Exception:
        pass
    return added


register_nltk_stemmers()


#: spec-implemented dependency-free stemmers that stand in for their
#: nltk equivalents when nltk is absent (same published algorithm —
#: porter2.py/snowball_sv.py implement the Snowball specs directly)
_SPEC_FALLBACKS: dict[str, str] = {
    "en": "porter2_en", "simple": "porter2_en", "sv": "snowball_sv",
    "de": "snowball_de",
}


def stemmer_for_lang(lang: str) -> str | None:
    """``_get_stemmer`` parity (textnormalizer.pyx:112-121): the
    STEMMERS key to use for a language, or ``None`` = skip stemming.
    Resolution order: the nltk-registered ``snowball_<lang>``/
    ``isri_ar`` when present, else the dependency-free SPEC
    implementation of the same algorithm (porter2_en for en/simple,
    snowball_sv for sv), else ``None`` — the reference skips
    unsupported languages rather than approximating, and so does this
    (``snowball_lite`` is opt-in by name, never routed silently)."""
    if lang == "ar":
        return "isri_ar" if "isri_ar" in STEMMERS else None
    if lang in _SNOWBALL_LANGS:
        key = f"snowball_{lang}"
        if key in STEMMERS:
            return key
        fb = _SPEC_FALLBACKS.get(lang)
        return fb if fb in STEMMERS else None
    return None


def column_stemmer(stem_py: Callable[[str], str]) -> Callable[[Column], Column]:
    """Lift a plain ``str -> str`` stemmer to a Column function via an
    Arrow-batched pandas UDF.  Per-batch memoization: term columns are
    Zipf-repetitive, so the Python callable runs once per distinct term
    per batch, not once per row."""
    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        uniq = {w: stem_py(w) for w in s.dropna().unique()}
        return s.map(uniq)

    return lambda c: _stem(c)


def stem_dict(
    terms: DataFrame,
    *,
    term_col: str = "term",
    stem_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """(stem, original): shortest original per stem, (len, word) min.
    ``stem_fn`` is any Column function (:func:`default_stem` when None;
    use :func:`column_stemmer` to plug a Python stemmer)."""
    fn = stem_fn or default_stem
    stemmed = terms.select(
        fn(F.col(term_col)).alias("stem"), F.col(term_col).alias("original")
    )
    return stemmed.groupBy("stem").agg(
        F.min_by("original", F.struct(F.length("original"), F.col("original"))).alias("original")
    )


def stem_terms(
    tf: DataFrame,
    stem_fn: Callable[[Column], Column],
    *,
    term_col: str = "term",
    agg_col: str = "tf",
) -> DataFrame:
    """Re-key a (…keys…, term, tf) table by stem and re-aggregate — the
    S7 stemming step applied post-tokenize (per-token, so equivalent to
    stemming inside the normalizer as the reference does).  All columns
    other than (term, tf) are treated as group keys."""
    keys = [c for c in tf.columns if c not in (term_col, agg_col)]
    return (
        tf.withColumn(term_col, stem_fn(F.col(term_col)))
        .groupBy(*keys, term_col)
        .agg(F.sum(agg_col).alias(agg_col))
    )


def destem(df: DataFrame, dictionary: DataFrame, *, term_col: str = "term") -> DataFrame:
    """S14 (destemmer.pyx:45-82): replace stems with originals via a
    broadcast left join; unmatched terms pass through (coalesce)."""
    d = F.broadcast(dictionary.withColumnRenamed("stem", term_col))
    return (
        df.join(d, term_col, "left")
        .withColumn(term_col, F.coalesce("original", term_col))
        .drop("original")
    )
