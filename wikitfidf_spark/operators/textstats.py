"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Pipeline extensions (the reference's only text analytics are its word
frequencies).  All pure JVM SQL expressions — each has an exact DuckDB
oracle.  The marker lists are deliberately tiny inline constants so the
Spark and SQL variants can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import TOKEN_REGEX, tokens_col

EN_MARKERS = ["the", "and", "for", "with", "that"]
STOPWORDS = ["the", "and", "for", "with", "that", "this", "from", "into"]


def token_counts(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_tokens, n_distinct_terms): whitespace
    split count vs grammar-token count vs vocabulary size."""
    toks = tokens_col(F.col(text))
    # split('') returns [''] (one empty element) — empty/whitespace-only
    # docs must report 0 whitespace tokens, not a phantom 1
    trimmed = F.trim(F.col(text))
    ws = F.when(
        trimmed.isNull() | (trimmed == ""), F.lit(0)
    ).otherwise(F.size(F.split(trimmed, r"\s+")))
    return docs.select(
        F.col(doc_id),
        ws.alias("n_ws_tokens"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_terms"),
    )


def quality_scores(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, alpha_ratio, stopword_ratio,
    mean_token_len, quality): cheap per-doc quality features + a
    composite in [0,1] — the usual pretraining-filter shape."""
    toks = tokens_col(F.col(text))
    n_chars = F.length(F.col(text))
    alpha_chars = F.length(F.regexp_replace(F.lower(F.col(text)), "[^a-z0-9_]", ""))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    base = docs.select(
        F.col(doc_id),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("alpha_ratio"),
        (n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")).alias("stopword_ratio"),
        (
            (F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))).cast("double")
            / F.greatest(n_tokens, F.lit(1)).cast("double")
        ).alias("mean_token_len"),
    )
    quality = F.round(
        F.least(
            F.lit(1.0),
            F.col("alpha_ratio") * 0.5
            + F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5,
        ),
        6,
    )
    return base.withColumn("quality", quality)


def lang_id(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text", threshold: float = 0.05) -> DataFrame:
    """(doc_id, marker_ratio, lang_guess): n-gram-free heuristic —
    fraction of tokens that are English marker words."""
    toks = tokens_col(F.col(text))
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    ratio = hits.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    return docs.select(
        F.col(doc_id),
        F.round(ratio, 6).alias("marker_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of whitespace-normalized lowercase text — the
    canonical-form exact-dup fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text)), r"\s+", " "))
    return docs.select(F.col(doc_id), F.md5(norm).alias("fp"))


def term_cooccurrence(
    tf: DataFrame,
    target_term: str,
    *,
    doc_id: str = "doc_id",
    min_pair_docs: int = 2,
) -> DataFrame:
    """Document-level co-occurrence + PMI against ``target_term``:
    ``(term, n_ab, n_a, n_b, pmi_q)`` where n_ab = docs containing both,
    n_a = docs containing the target, n_b = docs containing the term,
    and ``pmi_q = round6(log((n_ab·N)/(n_a·n_b)))`` — the keyword-
    association primitive (related-terms panels, query expansion,
    collocation mining).

    Plan shape: the pair join's LEFT side is the target term's doc set
    (selective by construction — one term), so the join probes only
    matching docs; N and n_a ride along as broadcast singletons; df per
    term comes from a partial-agg count.  Nothing is O(all pairs):
    candidates are restricted to terms sharing ≥1 doc with the target.
    Quantized round-half-up log keeps the value bit-stable across
    engines (same contract as the BM25/cosine kernels)."""
    from .scoring import round_half_up

    a_docs = tf.filter(F.col("term") == target_term).select(doc_id)
    n_tot = tf.select(doc_id).distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    n_a = a_docs.agg(F.count(F.lit(1)).alias("n_a"))
    pair = (
        tf.join(a_docs, doc_id)                      # docs containing the target
        .filter(F.col("term") != target_term)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_ab"))        # tf rows unique per (doc, term)
        .filter(F.col("n_ab") >= min_pair_docs)
    )
    df_b = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_b"))
    j = (
        pair.join(df_b, "term")
        .crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_tot))
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.col("n_docs").cast("double"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return j.select(
        "term", "n_ab", "n_a", "n_b", round_half_up(pmi, 6).alias("pmi_q")
    )
