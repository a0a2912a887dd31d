"""Eval-set decontamination for training-data pipelines.

No reference counterpart (wikitfidf never decontaminates); this is the
n-gram overlap filter every large-scale training pipeline runs before
training: drop (or flag) training documents that share any long n-gram
with a held-out evaluation set, so benchmark answers don't leak into
the training corpus (the GPT-3 appendix-C 13-gram filter; Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499, applies the same n-gram machinery corpus-internally).

Scale shape (the 100-TB story):

- The eval side is benchmark-sized (thousands to low millions of
  grams), the train side is the corpus.  Eval grams are therefore
  globally ``distinct`` and BROADCAST; the train side streams through
  one tokenize → n-gram projection and an equi-join that Catalyst
  executes as a broadcast hash join — the corpus is never shuffled.
- Grams are md5-hashed before the join so the probe key is a fixed
  32-byte column regardless of n (and identical in Spark, DuckDB and
  Python — the oracle recomputes it bit-for-bit).
- Everything is JVM codegen (``transform``/``slice``/``md5`` over the
  token array) — no UDFs, no per-row Python.

Determinism: md5-of-string grams; documents shorter than n tokens
contribute no grams and can never be flagged (matching the SQL
oracle's ``range`` bound, which emits nothing for short docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col

#: default overlap gram length — the GPT-3 appendix-C value: long
#: enough that natural-vocabulary collisions are rare on REAL text,
#: short enough to catch paraphrase-free leaks.  The repo's synthetic
#: test corpus has a tiny vocabulary, so its fixtures/oracles pass
#: n=5 explicitly — that tuning stays out of the library default
#: (a 5-gram default on real text would flag large numbers of
#: innocent documents sharing common five-word phrases)
DECON_N = 13


def ngram_sets(
    docs: DataFrame, *, n: int = DECON_N, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(doc_id, gram) — distinct md5-hashed n-token grams per doc.

    Docs with fewer than ``n`` tokens emit nothing (they cannot leak an
    n-gram).  The gram column is md5 of the space-joined token window:
    fixed-width join key, engine-independent."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select(doc_id, tokens_col(text).alias("toks")).filter(
        F.size("toks") >= n
    )
    return (
        toks.select(
            doc_id,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}),"
                    f" i -> md5(concat_ws(' ', slice(toks, i, {n}))))"
                )
            ).alias("gram"),
        )
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = DECON_N,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-train-doc overlap with the eval set → (doc_id, n_hit_grams,
    n_grams, hit_frac), CONTAMINATED DOCS ONLY (>= 1 shared gram),
    ordered (doc_id asc).

    ``n_grams`` counts the doc's distinct grams, ``n_hit_grams`` those
    also present anywhere in the eval set, ``hit_frac`` their ratio —
    callers threshold on it (any-hit for strict GPT-3-style dropping,
    a fraction for soft policies)."""
    tg = ngram_sets(train, n=n, doc_id=doc_id, text=text)
    eg = ngram_sets(eval_docs, n=n, doc_id=doc_id, text=text).select("gram").distinct()
    hits = (
        tg.join(F.broadcast(eg), "gram")
        .groupBy(doc_id)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    totals = tg.groupBy(doc_id).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        hits.join(totals, doc_id)
        .select(
            doc_id,
            "n_hit_grams",
            "n_grams",
            (F.col("n_hit_grams").cast("double") / F.col("n_grams")).alias("hit_frac"),
        )
        .orderBy(doc_id)
    )


def dup_span_report(
    docs: DataFrame,
    *,
    n: int = DECON_N,
    min_docs: int = 2,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Corpus-internal duplicated-span report (the intra-corpus half of
    Lee et al. 2021): per doc, how much of it is made of n-grams that
    also appear in >= ``min_docs`` distinct documents → (doc_id,
    n_dup_grams, n_grams, dup_frac), docs with >= 1 duplicated gram
    only, ordered (doc_id asc).  Pipelines threshold on ``dup_frac``
    to drop boilerplate-heavy documents (licenses, headers, templated
    text) that exact and MinHash dedup both miss when the surrounding
    bytes differ.

    Scale shape: gram doc-frequency is ONE hash agg on the md5 gram
    key (uniform — md5 cannot skew); the duplicated-gram set joins
    back on the same key (shuffle equi-join; unlike the eval side of
    :func:`contamination_report` it is corpus-sized, so it is NOT
    broadcast).  Everything stays JVM codegen."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    g = ngram_sets(docs, n=n, doc_id=doc_id, text=text)
    # g is distinct per (doc, gram), so count(*) per gram = doc frequency
    dup = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .filter(F.col("gdf") >= min_docs)
        .select("gram")
    )
    hits = (
        g.join(dup, "gram")
        .groupBy(doc_id)
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    totals = g.groupBy(doc_id).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        hits.join(totals, doc_id)
        .select(
            doc_id,
            "n_dup_grams",
            "n_grams",
            (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias("dup_frac"),
        )
        .orderBy(doc_id)
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = DECON_N,
    max_hit_frac: float = 0.0,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Train docs with eval overlap above policy removed: keeps docs
    whose hit_frac <= ``max_hit_frac`` (default 0.0 = the strict
    any-shared-gram drop).  Anti-join on doc_id — the train table's
    columns pass through untouched (sha256(content) invariance)."""
    bad = contamination_report(
        train, eval_docs, n=n, doc_id=doc_id, text=text
    ).filter(F.col("hit_frac") > max_hit_frac).select(doc_id)
    return train.join(bad, doc_id, "left_anti")
