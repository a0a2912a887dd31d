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
JSON-serializable.  :func:`snowball_lite` is a small original
suffix-stripper standing in for Snowball in tests.
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


#: named stemmers usable from JSON-serializable config (IndexConfig.stemmer)
STEMMERS: dict[str, Callable[[str], str]] = {"snowball_lite": snowball_lite}


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
