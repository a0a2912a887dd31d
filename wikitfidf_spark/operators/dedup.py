"""Deduplication operators for large-scale corpus pipelines.

No reference counterpart (wikitfidf never dedups); these are the
training-data-pipeline extensions the engine needs at 100 TB.  All
paths are pure DataFrame ops (JVM codegen, shuffle-minimal) and are
expressible in ANSI SQL for oracle checking.

- exact:    hash-groupBy on md5(text) — one shuffle on a uniform key.
- shingles: k-token shingles (k=3) as the set MinHash operates on.
            Unigram sets are non-selective on a small vocabulary (every
            doc shares most tokens → banding degenerates to all-pairs);
            shingles restore selectivity because the effective alphabet
            is |vocab|^k.
- minhash:  n independent MinHash signatures from md5(seed || shingle)
            over the distinct shingle set, banded LSH (16 hashes ×
            4 rows/band → 4 bands) → candidate pairs via an equi-join
            on (band_idx, band).  P(candidate) = 1-(1-J^4)^4: near 1
            for J ≥ 0.9, ~6% at J = 0.5 — candidates stay a small
            fraction of n²/2 (asserted in tests) instead of growing
            quadratically.
- jaccard:  exact shingle-set Jaccard verified on the LSH candidates
            (the classic candidate-then-verify split: cheap recall
            stage + exact precision stage).
- simhash:  tf-weighted 16-bit SimHash via a bit-position explode —
            still pure SQL (md5 hex → int bucket), groupable for
            near-dup banding.

Determinism: every hash is md5-of-string (identical across Spark,
DuckDB, Python); tie-breaks keep the smallest doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col

SIMHASH_BITS = 16
SHINGLE_K = 3
MINHASH_N = 16
MINHASH_ROWS_PER_BAND = 4


def exact_dup_groups(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """(text_md5, keep_id, n_dups): canonical representative = min id."""
    return (
        docs.select(F.md5(F.col(text)).alias("text_md5"), F.col(doc_id))
        .groupBy("text_md5")
        .agg(F.min(doc_id).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def dedup_exact(docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """Docs minus exact duplicates (keeps min doc_id per content hash)."""
    keep = exact_dup_groups(docs, doc_id=doc_id, text=text).select(
        F.col("keep_id").alias(doc_id)
    )
    return docs.join(keep, doc_id, "left_semi")


def shingle_sets(
    docs: DataFrame, *, k: int = SHINGLE_K, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(doc_id, term) distinct k-token shingles — the set MinHash
    signatures are computed over.  Pure JVM SQL (transform + slice over
    the token array); docs with 1..k-1 tokens contribute one short
    shingle so they don't vanish, while ZERO-token docs are dropped
    entirely (their only candidate shingle is the empty string, which
    would make every token-less doc a mutual near-dup candidate — and
    the SQL oracle's NULL-banding drops them too, so both sides agree)."""
    toks = docs.select(doc_id, tokens_col(text).alias("toks"))
    sh = toks.select(
        doc_id,
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(toks) - {k - 1}, 1)),"
                f" i -> concat_ws(' ', slice(toks, i, {k})))"
            )
        ).alias("term"),
    )
    return sh.filter(F.col("term") != "").distinct()


def _minhash_sig(tf: DataFrame, n_hashes: int, doc_id: str) -> DataFrame:
    """One row per doc with n_hashes MinHash columns s0..s{n-1}.
    h_i(term) = md5('<i>:' || term); signature = min per doc."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("term")))).alias(f"s{i}")
        for i in range(n_hashes)
    ]
    return tf.select(doc_id, "term").distinct().groupBy(doc_id).agg(*aggs)


def minhash_bands(
    tf: DataFrame,
    *,
    doc_id: str = "doc_id",
    n_hashes: int = MINHASH_N,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, band_idx, band) — LSH bucketing of MinHash signatures.
    ``tf`` is any (doc_id, term)-shaped set table; pass
    :func:`shingle_sets` output for selective near-dup banding."""
    sig = _minhash_sig(tf, n_hashes, doc_id)
    n_bands = n_hashes // rows_per_band
    parts = []
    for j in range(n_bands):
        cols = [F.col(f"s{j * rows_per_band + r}") for r in range(rows_per_band)]
        parts.append(
            sig.select(
                F.col(doc_id),
                F.lit(j).alias("band_idx"),
                F.concat_ws("|", *cols).alias("band"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_candidates(
    tf: DataFrame,
    *,
    doc_id: str = "doc_id",
    n_hashes: int = MINHASH_N,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band."""
    b = minhash_bands(tf, doc_id=doc_id, n_hashes=n_hashes, rows_per_band=rows_per_band)
    # the self-join references the band table twice; materialize it once
    # instead of recomputing the tokenize -> signature lineage per side.
    # localCheckpoint (not persist): its blocks are released by the
    # ContextCleaner when the DataFrame is garbage collected, so repeated
    # calls don't pin executor storage for the application lifetime
    b = b.localCheckpoint(eager=True)
    left = b.select(F.col("band_idx"), F.col("band"), F.col(doc_id).alias("a"))
    right = b.select(F.col("band_idx"), F.col("band"), F.col(doc_id).alias("b"))
    return (
        left.join(right, ["band_idx", "band"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, tf: DataFrame, *, doc_id: str = "doc_id"
) -> DataFrame:
    """(a, b, inter, size_a, size_b, jaccard) — exact token-set Jaccard
    for given candidate pairs.  Joins are on doc ids (uniform keys)."""
    terms = tf.select(F.col(doc_id), "term").distinct()
    sizes = terms.groupBy(doc_id).agg(F.count("*").alias("sz"))
    ta = terms.select(F.col(doc_id).alias("a"), "term")
    tb = terms.select(F.col(doc_id).alias("b"), "term")
    inter = (
        pairs.join(ta, "a").join(tb, ["b", "term"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(doc_id).alias("a"), F.col("sz").alias("size_a")), "a")
        .join(sizes.select(F.col(doc_id).alias("b"), F.col("sz").alias("size_b")), "b")
        .select(
            "a", "b", "inter", "size_a", "size_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def term_hash60(term: F.Column | str) -> F.Column:
    """First 15 hex chars of md5 as a bigint (fits in 60 bits) —
    identical in Spark (conv) and DuckDB ('0x…'::bigint)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash(tf: DataFrame, *, doc_id: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over ``bits`` low bits of
    the term hash.  Bit-position explode keeps it pure SQL: each (doc,
    term) row fans out ``bits`` rows; the per-(doc,bit) signed sum's
    sign is the output bit."""
    h = tf.select(
        F.col(doc_id), F.col("tf"), term_hash60("term").alias("h")
    ).select(
        doc_id, "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("r")
    )
    signed = h.select(
        F.col(doc_id),
        "r",
        (F.col("tf") * (F.expr("shiftright(h, cast(r as int)) & 1") * 2 - 1)).alias("c"),
    )
    return (
        signed.groupBy(doc_id, "r")
        .agg(F.sum("c").alias("s"))
        .groupBy(doc_id)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), cast(r as int))")).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def connected_components(
    pairs: DataFrame, *, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """Near-dup CLUSTERING: connected components over a pair table →
    (doc_id, component_id) for every doc appearing in ``pairs``, where
    component_id = the smallest doc_id reachable through the pair
    graph.  This is the step between pair generation (MinHash/Jaccard,
    embedding LSH) and canonical-document selection: keep
    ``min(doc_id)`` per component, drop the rest — pairwise dedup
    alone under-deletes (A~B, B~C but A!~C still means one keeper, not
    two).

    Algorithm: min-label propagation — each node starts labeled with
    itself; each round every node takes the min of its own and its
    neighbors' labels; converged when a round changes nothing.  Rounds
    = O(graph diameter), and near-dup graphs are clique-ish (diameter
    2-4), so the loop is short; ``max_iter`` bounds adversarial
    chains.  Scale shape: the edge table is symmetrized ONCE and
    localCheckpointed (released by the ContextCleaner, not pinned);
    each round is one equi-join + partial-agg min + one label join —
    all hash-partitioned on node id, no broadcast of anything
    corpus-sized; labels are localCheckpointed per round so the plan
    does not grow with iterations (the classic failure mode of
    iterative DataFrame algorithms).  The per-round convergence count
    is one scalar action.

    Deterministic: min over int64 labels, no floats, no ordering
    sensitivity — the DuckDB oracle re-derives it with a recursive
    transitive closure."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.col("src").alias("comp")
    ).localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "comp"), "dst"
            )
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
            .select(F.col("src").alias("node"), "nbr_comp")
        )
        # ONE join per round: the checkpointed merge answers both the
        # new labels (projection) and the convergence count (labels
        # only ever decrease, so changed = rows where the neighbor min
        # beats the own label)
        merged = (
            labels.join(nbr, "node", "left")
            .select(
                "node", "comp",
                F.coalesce("nbr_comp", "comp").alias("nbr_comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.filter(F.col("nbr_comp") < F.col("comp")).count()
        labels = merged.select(
            "node", F.least("comp", "nbr_comp").alias("comp")
        )
        if changed == 0:
            break
    if changed != 0:
        # silently returning partially-propagated labels would keep
        # multiple "canonical" docs per true group — the exact
        # under-deletion this operator exists to fix
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still moving); the pair graph has diameter "
            f"> max_iter — raise max_iter"
        )
    # no orderBy: callers at corpus scale don't need a global sort
    # (canonical selection is per-component; the oracle compare is
    # order-insensitive) — the entry that wants cosmetic order adds it
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component_id")
    )
