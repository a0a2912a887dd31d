"""Similarity search over embedding columns (array<float>).

Pipeline extension (no reference counterpart).  Two strategies:

- brute-force cosine top-k: the exact baseline.  Deterministic across
  engines via the quantized-integer-sum trick (operators/scoring.py):
  per-element products are quantized to int64 *before* the distributed
  sum, so dot products are bit-identical at any parallelism and match
  the DuckDB oracle.  Positional explode + broadcast join on position
  keeps it pure JVM SQL; an Arrow/numpy variant is provided for speed.
- LSH-bucketed (random-hyperplane signs): the scale path — docs are
  bucketed by a deterministic sign signature; candidates only compare
  within a bucket (same candidate/verify split as dedup.minhash).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT_QUANT = 1_000_000_000  # 1e9: per-element product quantization


def _quantized_pos_products(vecs: DataFrame, qvec: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dot_q, norm2_q) vs the single-row query vector, via
    posexplode + broadcast position join; all sums are exact int64."""
    v = vecs.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    q = qvec.select(F.posexplode(F.col(vec_col)).alias("pos", "qx")).withColumn(
        "qx", F.col("qx").cast("double")
    )
    joined = v.join(F.broadcast(q), "pos")
    return joined.groupBy(id_col).agg(
        F.sum(F.floor(F.col("x") * F.col("qx") * F.lit(float(DOT_QUANT)) + F.lit(0.5)).cast("long")).alias("dot_q"),
        F.sum(F.floor(F.col("x") * F.col("x") * F.lit(float(DOT_QUANT)) + F.lit(0.5)).cast("long")).alias("norm2_q"),
    )


def cosine_topk_bruteforce(
    vecs: DataFrame,
    query_id: int,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the vector with ``query_id``; excludes
    the query row; (cos desc, id asc) tie-break, cos rounded to 6.

    Vectors that quantize to zero norm carry no cosine signal and are
    EXCLUDED from the ranking (0/0 would otherwise emit NaN, which
    Spark's descending sort ranks above every real match).  A zero-norm
    QUERY vector likewise yields an empty result."""
    qvec = vecs.filter(F.col(id_col) == query_id)
    stats = _quantized_pos_products(vecs, qvec, id_col, vec_col)
    qn = stats.filter(F.col(id_col) == query_id).select(
        F.col("norm2_q").alias("qnorm2_q")
    )
    cos = (
        stats.crossJoin(F.broadcast(qn))
        .filter(F.col(id_col) != query_id)
        .filter((F.col("norm2_q") > 0) & (F.col("qnorm2_q") > 0))
        .select(
            id_col,
            (
                F.floor(
                    F.col("dot_q").cast("double")
                    / (F.sqrt(F.col("norm2_q").cast("double")) * F.sqrt(F.col("qnorm2_q").cast("double")))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("cos"),
        )
    )
    return cos.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def cosine_topk_arrow(
    vecs: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy brute-force: per-partition top-k (mapInPandas with a
    matrix product) then a global TakeOrderedAndProject — the shape that
    survives 10^9 vectors (no explode, no shuffle before the cut)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn2 = np.floor(q * q * DOT_QUANT + 0.5).astype(np.int64).sum()
    if qn2 == 0:
        raise ValueError("query vector quantizes to zero norm — cosine undefined")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # int64 sums: the module-wide exact-arithmetic contract
            dots = np.floor(m * q * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            norms = np.floor(m * m * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            # zero-norm corpus vectors have no cosine signal: drop them
            # (0/0 -> NaN, which desc sort would rank ABOVE real matches)
            live = norms > 0
            if not live.all():
                pdf, dots, norms = pdf[live], dots[live], norms[live]
                if not len(pdf):
                    continue
            cos = dots / (np.sqrt(norms.astype(np.float64)) * np.sqrt(float(qn2)))
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            out = pd.DataFrame({id_col: pdf[id_col], "cos": cos})
            # per-partition cut with the exact global tie-break — a bare
            # nlargest drops boundary ties by arrival order
            yield out.sort_values(["cos", id_col], ascending=[False, True]).head(k)

    local = vecs.select(id_col, vec_col).mapInPandas(score, f"{id_col} long, cos double")
    return local.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def lsh_planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Seeded hyperplane matrix (dim, n_planes) — the one definition
    shared by the Spark operator and the DuckDB oracle literal table."""
    return np.random.RandomState(seed).randn(dim, n_planes)


def hyperplane_signature(
    vecs: DataFrame, n_planes: int = 8, *, id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    """(id, sig) deterministic random-hyperplane LSH signature.  Planes
    are seeded numpy normals broadcast in the closure; per-element
    products are quantized to int64 *before* the per-plane sum, so the
    sign (hence the bucket) is bit-identical at any parallelism and in
    any engine that replays the same quantization (the DuckDB oracle
    does)."""
    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                planes = lsh_planes(m.shape[1], n_planes, seed)
            sums = np.floor(m[:, :, None] * planes[None, :, :] * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            bits = (sums > 0).astype(np.int64)
            sig = (bits << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sig})

    return vecs.select(id_col, vec_col).mapInPandas(make, f"{id_col} long, sig long")


def hyperplane_band_signatures(
    vecs: DataFrame,
    n_planes: int = 8,
    n_bands: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(id, band, sig): ``n_bands`` independent ``n_planes``-bit
    signatures per vector — the banded (multi-table) form of
    :func:`hyperplane_signature`, mirroring dedup.minhash_bands.  A pair
    is a candidate when it collides in ANY band, so recall is
    ``1-(1-p^P)^R`` instead of ``p^P`` — the standard OR-of-ANDs
    amplification.  All ``P*R`` planes come from one seeded matrix
    (``lsh_planes(dim, P*R, seed)``); band b uses columns
    ``[b*P, (b+1)*P)``, so ``n_bands=1`` emits exactly the single-table
    signature.  Same int64 quantization contract as everything else in
    this module — bucket assignment is bit-identical at any parallelism
    and in the SQL oracle."""
    total = n_planes * n_bands

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                planes = lsh_planes(m.shape[1], total, seed)
            sums = np.floor(m[:, :, None] * planes[None, :, :] * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            bits = (sums > 0).astype(np.int64)  # (n, P*R)
            n = len(pdf)
            shifts = np.arange(n_planes, dtype=np.int64)
            sig = np.empty((n, n_bands), dtype=np.int64)
            for b_i in range(n_bands):
                sig[:, b_i] = (bits[:, b_i * n_planes:(b_i + 1) * n_planes] << shifts).sum(axis=1)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32), n),
                "sig": sig.reshape(-1),  # row-major: matches the repeat
            })

    return vecs.select(id_col, vec_col).mapInPandas(
        make, f"{id_col} long, band int, sig long"
    )


def _pair_score_fn(threshold: float):
    """The one quantized-cosine verify kernel shared by the exact and
    LSH near-dup paths — keeping it single-sourced is what guarantees
    the scale path's verify step stays bit-identical to the exact
    anchor."""
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ma = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            mb = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            dots = np.floor(ma * mb * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            na = np.floor(ma * ma * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            nb = np.floor(mb * mb * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            cos = dots / (np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64)))
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            keep = cos >= threshold
            yield pd.DataFrame({
                "id_a": pdf["id_a"][keep],
                "id_b": pdf["id_b"][keep],
                "cos": cos[keep],
            })

    return score


#: cosine_pairs_exact refuses above this many vectors unless overridden
#: — the all-pairs anchor must not be invocable at scale by accident
EXACT_PAIRS_MAX_ROWS = 50_000

#: per-DataFrame-object memo for the guard's row count — repeated
#: guarded calls over the same DataFrame cost ONE count job, not one
#: per call (weak keys: the memo never pins a DataFrame alive).
#: Caveat, by design: the guard is a foot-gun protector, not a hard
#: limit — if the FILES under a memoized DataFrame's path grow between
#: calls (Spark re-lists per action), the cached count is stale and the
#: guard may under-count; pass n_rows or a fresh DataFrame when the
#: source mutates
_GUARD_COUNT_MEMO: "weakref.WeakKeyDictionary[DataFrame, int]" = None  # type: ignore[assignment]


def _guarded_count(vecs: DataFrame) -> int:
    global _GUARD_COUNT_MEMO
    import weakref

    if _GUARD_COUNT_MEMO is None:
        _GUARD_COUNT_MEMO = weakref.WeakKeyDictionary()
    try:
        return _GUARD_COUNT_MEMO[vecs]
    except (KeyError, TypeError):
        pass
    n = int(vecs.count())
    try:
        _GUARD_COUNT_MEMO[vecs] = n
    except TypeError:
        pass
    return n


def cosine_pairs_exact(
    vecs: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = EXACT_PAIRS_MAX_ROWS,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    quantized cosine ≥ ``threshold``.  Exact baseline: broadcast
    nested-loop over Arrow batches (each batch scores against the full
    broadcast side with one matrix product — no per-row Python).

    Deliberately O(n²): this is the small-scale oracle anchor and the
    source of the verify kernel — NOT a scale path (10^6 vectors would
    be 5·10^11 pair rows).  It therefore guards itself: above
    ``max_rows`` vectors it raises and points at ``cosine_pairs_lsh``
    (banded LSH candidates + the same exact verify kernel).  Pass
    ``max_rows=None`` to force the quadratic plan knowingly.

    The guard's count job runs once per DataFrame object (memoized with
    weak keys), and callers that already know the cardinality can pass
    ``n_rows`` to skip the action entirely."""
    if max_rows is not None:
        n = n_rows if n_rows is not None else _guarded_count(vecs)
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs_exact is the O(n^2) all-pairs anchor: {n} vectors > "
                f"max_rows={max_rows} (~{n * (n - 1) // 2:,} pair rows). Use "
                "cosine_pairs_lsh(n_planes=..., n_bands=...) at scale, or pass "
                "max_rows=None to force."
            )
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        .join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    )
    return pairs.mapInPandas(_pair_score_fn(threshold), "id_a long, id_b long, cos double")


def cosine_pairs_lsh(
    vecs: DataFrame,
    threshold: float,
    n_planes: int = 8,
    n_bands: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Scale path for near-dup pairs: candidates = collision in ANY of
    ``n_bands`` independent ``n_planes``-bit signature bands (equi-join
    per band + distinct — no cross join anywhere), then the exact
    quantized-cosine verify kernel on the candidates only.

    Recall per pair at angle θ is ``1-(1-p^P)^R`` with
    ``p = 1-θ/π`` — banding (R>1) is how recall reaches ~1 for true
    near-dups while candidates stay far below n²/2
    (tests/test_pipeline_ops.py plants near-dups and asserts recall
    ≥ 0.9 at cos ≥ 0.6 with P=12, R=100).  Vectors are attached AFTER
    the distinct (two id equi-joins), so the band fan-out never
    duplicates payload vectors."""
    sig = hyperplane_band_signatures(
        vecs, n_planes, n_bands, id_col=id_col, vec_col=vec_col, seed=seed
    )
    a = sig.select("band", "sig", F.col(id_col).alias("id_a"))
    b = sig.select("band", "sig", F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cand = pairs.join(va, "id_a").join(vb, "id_b")
    return cand.select("id_a", "id_b", "va", "vb").mapInPandas(
        _pair_score_fn(threshold), "id_a long, id_b long, cos double"
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = 9) -> np.ndarray:
    """Seeded coarse-quantizer centroid matrix (n_cells, dim) — the one
    definition shared by the Spark operator and the DuckDB oracle
    literal.  A fixed random quantizer (not data-trained k-means) keeps
    assignment deterministic and engine-independent; swap in trained
    centroids for better recall where a training pass is acceptable."""
    return np.random.RandomState(seed).randn(n_cells, dim)


def ivf_assignments(
    vecs: DataFrame,
    n_cells: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 9,
    emit_all: bool = False,
) -> DataFrame:
    """IVF coarse assignment: (id, cell) — nearest centroid by squared
    L2, computed as argmax(2·x·c_j − ‖c_j‖²) over integer-quantized
    dots so the winning cell is bit-identical at any parallelism and in
    the SQL oracle; ties break to the smallest cell id.  With
    ``emit_all`` every (id, cell, obj_q) row is emitted — used to rank
    a query's nprobe nearest cells."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if cent is None:
                cent = ivf_centroids(m.shape[1], n_cells, seed)
                cn2 = np.floor(cent * cent * DOT_QUANT + 0.5).astype(np.int64).sum(axis=1)
            dots = (
                np.floor(m[:, :, None] * cent.T[None, :, :] * DOT_QUANT + 0.5)
                .astype(np.int64)
                .sum(axis=1)
            )
            obj = 2 * dots - cn2[None, :]
            if emit_all:
                n, c = obj.shape
                yield pd.DataFrame({
                    id_col: np.repeat(pdf[id_col].to_numpy(), c),
                    "cell": np.tile(np.arange(c, dtype=np.int32), n),
                    "obj_q": obj.reshape(-1),
                })
            else:
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "cell": obj.argmax(axis=1).astype(np.int32),  # first max = smallest cell
                })

    schema = (
        f"{id_col} long, cell int, obj_q long" if emit_all else f"{id_col} long, cell int"
    )
    return vecs.select(id_col, vec_col).mapInPandas(fn, schema)


def cosine_topk_ivf(
    vecs: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 9,
) -> DataFrame:
    """IVF-flat ANN: coarse-assign every vector to its nearest centroid
    cell, probe the query's ``nprobe`` nearest cells, brute-force only
    inside them — the classic inverted-file scale path (cells shard the
    corpus; a probe touches ~nprobe/n_cells of the data).  Approximate:
    recall rises with nprobe.  Exactness anchor = the brute-force op."""
    assign = ivf_assignments(vecs, n_cells, id_col=id_col, vec_col=vec_col, seed=seed)
    qobj = ivf_assignments(
        vecs.filter(F.col(id_col) == query_id), n_cells,
        id_col=id_col, vec_col=vec_col, seed=seed, emit_all=True,
    )
    qcells = (
        qobj.orderBy(F.desc("obj_q"), F.asc("cell")).limit(nprobe).select("cell")
    )
    bucket_ids = assign.join(F.broadcast(qcells), "cell").select(id_col)
    bucket = vecs.join(bucket_ids, id_col, "left_semi")
    return cosine_topk_bruteforce(bucket, query_id, k, id_col=id_col, vec_col=vec_col)


def cosine_topk_lsh(
    vecs: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: restrict brute force to the query's LSH bucket.
    Approximate (recall < 1); exactness tests use the brute-force op."""
    sig = hyperplane_signature(vecs, n_planes, id_col=id_col, vec_col=vec_col)
    qsig = sig.filter(F.col(id_col) == query_id).select(F.col("sig").alias("qsig"))
    bucket_ids = (
        sig.crossJoin(F.broadcast(qsig)).filter(F.col("sig") == F.col("qsig")).select(id_col)
    )
    bucket = vecs.join(bucket_ids, id_col, "left_semi")
    return cosine_topk_bruteforce(bucket, query_id, k, id_col=id_col, vec_col=vec_col)
