"""Deterministic dataset splitting and stratified sampling — the
train/val/test primitives every large-scale training-data pipeline
needs in front of the dedup/quality operators.

Both operators assign each row a uniform unit hash ``u in [0, 1)``
derived from md5 over (seed, key columns) and threshold it.  Design
properties, all load-bearing at 100 TB:

- **Deterministic & engine-independent**: md5 is bit-identical in
  Spark and DuckDB (the driver oracle), so assignments are
  reproducible across runs, engines, and cluster sizes — no RNG state,
  no ``rand()`` (which is per-task nondeterministic under retries and
  unverifiable cross-engine).
- **Stable under growth**: a row's split never changes when other rows
  are added/removed (pure function of its key + seed) — the property
  that keeps training/holdout contamination-free across dataset
  versions.
- **Narrow plan**: one projection, no shuffle, no UDF — whole-stage
  codegen end to end; sampling pushes the threshold filter straight
  onto the scan.

The unit hash uses the first 15 hex chars of md5 (60 bits) exactly like
the SimHash operator's oracle contract: ``conv(substr(md5, 1, 15), 16,
10)`` in Spark ≡ ``('0x' || substr(md5, 1, 15))::bigint`` in DuckDB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16^15 — the unit-hash denominator (60 bits of md5)
_UNIT_DENOM = float(16**15)


def unit_hash(key_cols: Sequence[str], seed: int = 0) -> Column:
    """Uniform deterministic ``double`` in [0, 1) from (seed, keys).

    Each key column is md5-hashed BEFORE the join: every part is then
    fixed-width hex (so the ``|`` delimiter is unambiguous — no
    ``('a|b', c)`` vs ``('a', 'b|c')`` collisions) and NULL keys map to
    an explicit sentinel instead of being silently dropped by
    ``concat_ws`` (which would make (NULL, 'x') and ('x', NULL) — and
    any key-count mismatch — collide on the same unit)."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-")) for c in key_cols
    ]
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), *parts))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(_UNIT_DENOM)


def split_assign(
    df: DataFrame,
    weights: Mapping[str, float],
    *,
    key_cols: Sequence[str] = ("doc_id",),
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with probability
    proportional to ``weights`` (normalized).  Splits are disjoint and
    complete by construction (cumulative thresholds over one hash)."""
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    u = unit_hash(key_cols, seed)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += float(weights[name]) / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, label)


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float] | float,
    *,
    strata_col: str = "lang",
    key_cols: Sequence[str] = ("doc_id",),
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its unit hash
    is below its stratum's fraction.  ``fractions`` is either one
    global fraction or a per-stratum map (strata absent from the map
    keep fraction 0.0 — explicit opt-in per stratum, matching Spark's
    ``sampleBy`` contract but reproducible and engine-checkable)."""
    u = unit_hash(key_cols, seed)
    if isinstance(fractions, Mapping):
        for k, v in fractions.items():
            if not (0.0 <= float(v) <= 1.0):
                raise ValueError(f"fraction for {k!r} outside [0, 1]: {v}")
        pairs = [x for k, v in sorted(fractions.items()) for x in (F.lit(k), F.lit(float(v)))]
        frac = F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)], F.lit(0.0)
        )
    else:
        if not (0.0 <= float(fractions) <= 1.0):
            raise ValueError(f"fraction outside [0, 1]: {fractions}")
        frac = F.lit(float(fractions))
    return df.filter(u < frac)
