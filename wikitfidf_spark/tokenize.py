"""The shared deterministic tokenizer.

The reference tokenizes with spaCy/NLTK inside an embedded Cython
program (``/root/reference/internal/textnormalizer/textnormalizer.pyx:275-349``):
alpha tokens, lowercased/lemmatized, stopword-dropped, length-filtered to
``[MIN_WORD_LENGTH, 33]`` with MIN=3 for non-CJK
(``textnormalizer.pyx:103-109,170-176``).

For the source-code corpus (BASELINE.json:input_hint) we keep the same
*shape* — lowercase, alpha-ish identifiers, length filter [3, 33] — with a
deterministic identifier grammar instead of NLP:

    token := [a-z_][a-z0-9_]{2,32}   over lower(content)

Three implementations, proven equal by tests/test_tokenize.py:

1. :func:`tokens_col` — JVM-side ``regexp_extract_all`` (whole-stage
   codegen; used by the oracle-checkable relational queries).
2. :func:`tf_map_in_pandas` — Arrow-vectorized fused tokenize+count
   (the index-build hot path: emits per-doc term frequencies directly,
   shrinking shuffle input; "vectorized pandas UDF, no per-row Python"
   per BASELINE.json:north_star).
3. :func:`tokenize_py` — pure-Python oracle for golden tests.

The same regex runs in DuckDB (``regexp_extract_all``) for the driver's
SQL oracles; Java regex, RE2 (DuckDB) and Python ``re`` agree on this
pattern (greedy, non-overlapping, left-to-right).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Length bounds mirror the reference: MIN_WORD_LENGTH=3, max 33
# (textnormalizer.pyx:170-176; topwordspageextractor.pyx:27-33).
MIN_TOKEN_LEN = 3
MAX_TOKEN_LEN = 33

#: default letter class: the ASCII identifier grammar (the code corpus
#: the engine is built over).  Natural-language corpora extend it per
#: language via the ``letters`` knob (operators.normalize profiles) —
#: the reference tokenizes unicode word chars (textnormalizer.pyx).
DEFAULT_LETTERS = "a-z"


def token_regex(
    min_len: int = MIN_TOKEN_LEN,
    max_len: int = MAX_TOKEN_LEN,
    letters: str = DEFAULT_LETTERS,
) -> str:
    """The identifier grammar at a given length band.  ``min_len`` is
    the reference's per-language MIN_WORD_LENGTH knob — 3 for most
    languages, 1 for CJK (textnormalizer.pyx:170-176, the zh/ja/ko/th
    branch) — expressed as the repetition bound after the first char.
    ``letters`` is the char-class body of word letters (lowercase;
    matching runs on lowercased text) — literal unicode chars and
    ranges are fine, Java regex, RE2 (DuckDB) and Python ``re`` all
    accept them and agree on the result."""
    if not (1 <= min_len <= max_len):
        raise ValueError(f"need 1 <= min_len <= max_len, got [{min_len}, {max_len}]")
    return rf"[{letters}_][{letters}0-9_]{{{min_len - 1},{max_len - 1}}}"


# {2,32} repetitions after the first char -> total length in [3, 33].
TOKEN_REGEX = token_regex()

_TOKEN_RE = re.compile(TOKEN_REGEX)


def tokens_col(
    text: Column | str,
    *,
    stopwords: frozenset[str] | set[str] | tuple[str, ...] | None = None,
    min_len: int = MIN_TOKEN_LEN,
    letters: str = DEFAULT_LETTERS,
) -> Column:
    """Array-of-tokens column, entirely JVM-side (codegen'd, no UDF).

    ``stopwords``: optional stop set dropped post-match, mirroring the
    reference's normalization stage (textnormalizer.pyx:103-109 drops
    NLTK-language + english + forbidden words before stemming).  Uses
    ``F.filter`` with an ``isin`` predicate — NOT ``array_except``,
    which would also dedupe surviving tokens and corrupt tf.
    ``min_len``: per-language minimum token length (CJK=1 parity)."""
    c = F.col(text) if isinstance(text, str) else text
    arr = F.regexp_extract_all(F.lower(c), F.lit(token_regex(min_len, letters=letters)), 0)
    if stopwords:
        stop = sorted(set(stopwords))
        arr = F.filter(arr, lambda t: ~t.isin(stop))
    return arr


def tokenize_py(
    text: str,
    *,
    stopwords: frozenset[str] | set[str] | tuple[str, ...] | None = None,
    min_len: int = MIN_TOKEN_LEN,
    letters: str = DEFAULT_LETTERS,
) -> list[str]:
    """Pure-Python oracle tokenizer (identical semantics)."""
    if not text:
        return []
    pat = (
        _TOKEN_RE
        if min_len == MIN_TOKEN_LEN and letters == DEFAULT_LETTERS
        else re.compile(token_regex(min_len, letters=letters))
    )
    toks = pat.findall(text.lower())
    if stopwords:
        stop = set(stopwords)
        toks = [t for t in toks if t not in stop]
    return toks


def term_counts_py(text: str) -> dict[str, int]:
    return dict(Counter(tokenize_py(text)))


def tf_map_in_pandas(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "content",
    extra_cols: tuple[str, ...] = (),
    stem_py=None,
    stopwords: frozenset[str] | set[str] | tuple[str, ...] | None = None,
    min_len: int = MIN_TOKEN_LEN,
    letters: str = DEFAULT_LETTERS,
) -> DataFrame:
    """Fused tokenize + per-doc term-frequency count as ``mapInPandas``.

    Mirrors reference stages S7 (textnormalizer.pyx:275-349) + S9
    (wordmapperbypage.go:17-30) in one Arrow pass: each input row is one
    document; output rows are ``(doc_id, [extra_cols...], term, tf)``.

    Counting *inside* the Arrow batch (pandas ``str.findall`` → explode →
    groupby) means the shuffle that follows carries per-doc aggregated
    rows, not raw token streams — at 10^12-file scale this is the
    difference between shuffling O(tokens) and O(distinct terms per doc).

    ``stem_py``: optional plain ``str -> str`` stemmer applied per token
    inside the Arrow batch (memoized per batch — Zipf-repetitive vocab
    means one call per distinct term, not per occurrence).  This is the
    pluggable-tokenizer hook: the reference stems during normalization
    (textnormalizer.pyx:112-136) and this path reproduces that fusion.

    ``stopwords`` are dropped on the SURFACE token before stemming —
    the reference's normalization order (textnormalizer.pyx:103-121:
    stopword check, then stem).  ``min_len`` is the per-language
    minimum-length knob (CJK=1, textnormalizer.pyx:170-176).
    """
    carried = [doc_id, *extra_cols]
    # schema in CARRIED order (not docs.schema order): the yielded
    # pandas frames are column-ordered (doc_id, extras..., term, tf),
    # and a source schema listing an extra before doc_id would
    # otherwise swap columns under positional assignment
    out_schema = ", ".join(
        [f"`{c}` {docs.schema[c].dataType.simpleString()}" for c in carried]
        + ["term string", "tf long"]
    )

    pat = token_regex(min_len, letters=letters)
    stop = frozenset(stopwords) if stopwords else None

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[text].fillna("").str.lower().str.findall(pat)
            if stop is not None:
                toks = toks.map(lambda lst: [t for t in lst if t not in stop])
            flat = [t for lst in toks for t in lst]
            if stem_py is not None:
                memo: dict[str, str] = {}
                stemmed = []
                for t in flat:
                    r = memo.get(t)
                    if r is None:
                        r = memo[t] = stem_py(t)
                    stemmed.append(r)
                flat = stemmed
            exploded = pd.DataFrame({
                "_row": pdf.index.repeat(toks.str.len()),
                "term": flat,
            })
            if len(exploded) == 0:
                continue
            counts = (
                exploded.groupby(["_row", "term"], sort=False).size().rename("tf").reset_index()
            )
            out = counts.merge(
                pdf[carried].rename_axis("_row").reset_index(), on="_row", how="left"
            )[carried + ["term", "tf"]]
            yield out

    return docs.select(*carried, text).mapInPandas(fn, out_schema)
