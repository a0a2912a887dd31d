"""Sharded, resumable inverted-index build.

Pipeline (each phase = one materialized parquet + a manifest entry; a
rerun skips completed phases — the checkpoint-resume requirement of
BASELINE.json:north_rule):

  1. tf          (doc_id, term, tf)            codegen tokenize (or Arrow UDF)
  2. docmeta     (doc_id, repo, path, commit, topic, doc_len, content_sha256)
  3. dictionary  (term, df, cf)                salted two-phase agg
  4. postings    (shard, term, sub_shard, payloads, block sidecars)

Partitioning strategy (the 100 TB story):
- The index is **document-partitioned**: ``shard = xxhash64(doc_id) %
  n_shards``.  Every shard holds the full postings of its documents for
  every term, so BM25 scores are complete shard-locally — top-k is
  per-shard WAND + a k-row global merge, no cross-shard score assembly
  (the standard "local index partitioning" of the distributed-IR
  literature).  xxhash64 spreads documents uniformly → no doc skew.
- Within a shard, postings group by ``(term, sub_shard)``; hot terms
  (per-shard df above ``hot_df_threshold``) split into deterministic
  sub-lists so no single pandas group exceeds memory — this plus the
  salted dictionary agg is the explicit skew handling of north_rule.
- Posting rows are written sorted by term inside each shard file →
  parquet row-group min/max pruning serves term lookups without reading
  whole shards.

Reference parity: the whole build is wikitfidf's Preprocess+Process
chain (wikitfidf.go:99-224) collapsed into one DataFrame lineage; the
phase materializations replace its per-stage JSON directories, and the
manifest replaces its filename conventions.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterable
from dataclasses import asdict, dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import termstats
from ..operators.scoring import (
    B_DEFAULT,
    K1_DEFAULT,
    QUANT,
)
from ..tokenize import tf_map_in_pandas
from . import codec

POSTINGS_SCHEMA = (
    "shard int, term string, sub_shard int, n_docs long, cf long, "
    "docs_payload binary, tfs_payload binary, scores_payload binary, "
    "block_firsts array<long>, block_lasts array<long>, block_counts array<int>, "
    "block_max_score array<long>, block_doc_offs array<long>, "
    "block_tf_offs array<long>, block_score_offs array<long>"
)


@dataclass
class IndexConfig:
    n_shards: int = 32
    block_size: int = codec.BLOCK_SIZE_DEFAULT
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    n_salts: int = 8               # dictionary-agg salting fan-out
    hot_df_threshold: int = 262144  # per-shard df above which a term splits
    text_col: str = "content"
    topic_col: str = "lang"
    # "jvm": regexp_extract_all + explode + hash agg, whole-stage
    # codegen, zero Python — the fast path for the built-in identifier
    # grammar (and byte-identical to it: tests/test_tokenize.py).
    # "arrow": the fused tf_map_in_pandas pandas-UDF path — use when
    # plugging a tokenizer that needs Python (NLP/BPE); measured ~2-3x
    # slower on the default grammar (per-token object churn in the
    # workers), so it is opt-in.
    tokenizer: str = "jvm"
    # named stemmer from operators.stemdict.STEMMERS applied per token
    # during tokenization (reference stems inside the normalizer,
    # textnormalizer.pyx:112-136).  A name (not a callable) keeps the
    # config JSON-serializable for the manifest; Python stemmers need
    # tokenizer="arrow" (the JVM regexp path can't call Python).
    stemmer: str = "none"
    # natural-key columns hashed into the stable doc_id; empty tuple =
    # the input already carries a unique ``doc_id`` column (used as-is)
    id_cols: tuple[str, ...] = ("repo", "path", "commit")

    def to_json(self) -> dict:
        d = asdict(self)
        d["id_cols"] = list(d["id_cols"])  # JSON round-trip: tuple -> list
        return d


@dataclass
class BuildResult:
    index_dir: str
    metrics: dict = field(default_factory=dict)


def _tokenize(base: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Phase-1 tokenize per config: JVM codegen by default, the fused
    Arrow path for pluggable Python tokenizers/stemmers.  The one
    implementation shared by build_index and add_documents — deltas must
    tokenize identically to the base build."""
    stem_py = None
    if cfg.stemmer != "none":
        from ..operators.stemdict import STEMMERS

        if cfg.stemmer not in STEMMERS:
            raise ValueError(f"unknown stemmer {cfg.stemmer!r}; known: {sorted(STEMMERS)}")
        if cfg.tokenizer != "arrow":
            raise ValueError("a Python stemmer requires tokenizer='arrow'")
        stem_py = STEMMERS[cfg.stemmer]
    if cfg.tokenizer == "arrow":
        return tf_map_in_pandas(base, doc_id="doc_id", text=cfg.text_col, stem_py=stem_py)
    return termstats.term_frequencies(base, doc_id="doc_id", text=cfg.text_col)


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def load_manifest(index_dir: str) -> dict:
    p = _manifest_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"phases": {}, "metrics": {}, "config": None}


def _save_manifest(index_dir: str, m: dict) -> None:
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, default=str)
    os.replace(tmp, _manifest_path(index_dir))


def _phase_done(m: dict, name: str, path: str) -> bool:
    return name in m["phases"] and os.path.exists(os.path.join(path, "_SUCCESS"))


def encode_postings_df(
    tf: DataFrame,
    meta: DataFrame,
    stats: DataFrame,
    cfg: IndexConfig,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """The postings-encode plan: enrich tf with doc_len/df, shard by
    doc hash, sort within shards, stream-encode per partition.
    Deterministic: identical inputs produce byte-identical payloads at
    any parallelism (tests assert full-vs-incremental identity)."""
    k1, b, quant, block_size = cfg.k1, cfg.b, QUANT, cfg.block_size
    hot = cfg.hot_df_threshold
    n_shards = cfg.n_shards

    doclens = meta.select("doc_id", "doc_len")
    enriched = (
        tf.join(doclens, "doc_id")
        .join(stats.select("term", "df"), "term")
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
        .withColumn(
            "sub_shard",
            F.when(
                F.col("df") > F.lit(hot * n_shards),
                # ceil: a truncating divide gives factor 1 (= no split)
                # for df up to 2x the threshold, doubling the intended
                # per-group memory bound
                F.pmod(F.xxhash64("doc_id", F.lit(1)), F.ceil(F.col("df") / F.lit(hot * n_shards)).cast("int")),
            ).otherwise(F.lit(0)).cast("int"),
        )
    )

    import math as _math
    import numpy as _np

    def encode_stream(batches) -> "pd.DataFrame":
        """Streaming partition encoder: rows arrive sorted by
        (shard, term, sub_shard, doc_id); complete groups are
        encoded per Arrow chunk, the trailing (possibly incomplete)
        group is carried into the next chunk — memory is bounded by
        chunk size + one posting list, regardless of shard size."""

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            terms = pdf["term"].to_numpy()
            subs = pdf["sub_shard"].to_numpy()
            docs_a = pdf["doc_id"].to_numpy()
            tfs_a = pdf["tf"].to_numpy()
            dls_a = pdf["doc_len"].to_numpy()
            dfs_a = pdf["df"].to_numpy()
            shards_a = pdf["shard"].to_numpy()
            change = _np.empty(len(pdf), dtype=bool)
            change[0] = True
            # a partition may hold several shard values (hash
            # collisions) — group key is the full (shard, term, sub)
            change[1:] = (
                (terms[1:] != terms[:-1])
                | (subs[1:] != subs[:-1])
                | (shards_a[1:] != shards_a[:-1])
            )
            starts = _np.flatnonzero(change)
            ends = _np.append(starts[1:], len(pdf))
            out = []
            for a, b_e in zip(starts, ends):
                tfs = tfs_a[a:b_e]
                dls = dls_a[a:b_e]
                df_g = int(dfs_a[a])
                idf = _math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
                scores = idf * (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))
                scores_q = _np.floor(scores * quant + 0.5).astype(_np.int64)
                enc = codec.encode_postings(
                    docs_a[a:b_e], tfs, scores_q, block_size=block_size, presorted=True
                )
                out.append({
                    "shard": int(shards_a[a]),
                    "term": terms[a],
                    "sub_shard": int(subs[a]),
                    "n_docs": enc.n,
                    "cf": int(tfs.sum()),
                    "docs_payload": enc.docs_payload,
                    "tfs_payload": enc.tfs_payload,
                    "scores_payload": enc.scores_payload,
                    "block_firsts": enc.block_firsts.tolist(),
                    "block_lasts": enc.block_lasts.tolist(),
                    "block_counts": enc.block_counts.tolist(),
                    "block_max_score": enc.block_max_score.tolist(),
                    "block_doc_offs": enc.block_doc_offs.tolist(),
                    "block_tf_offs": enc.block_tf_offs.tolist(),
                    "block_score_offs": enc.block_score_offs.tolist(),
                })
            return pd.DataFrame(out)

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_term = pdf["term"].iloc[-1]
            last_sub = pdf["sub_shard"].iloc[-1]
            last_shard = pdf["shard"].iloc[-1]
            tail_mask = (
                (pdf["term"] == last_term)
                & (pdf["sub_shard"] == last_sub)
                & (pdf["shard"] == last_shard)
            )
            rev = tail_mask.to_numpy()[::-1]
            tail_len = len(pdf) if rev.all() else int(rev.argmin())
            cut = len(pdf) - tail_len
            carry = pdf.iloc[cut:]
            if cut:
                yield emit(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield emit(carry)

    return (
        enriched.select("shard", "term", "sub_shard", "doc_id", "tf", "doc_len", "df")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "term", "sub_shard", "doc_id")
        .mapInPandas(encode_stream, POSTINGS_SCHEMA)
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    *,
    resume: bool = True,
) -> BuildResult:
    """Build (or resume) the index at ``index_dir`` from the raw
    Iceberg-shaped code table.  ``docs`` must carry config.id_cols,
    config.topic_col and config.text_col."""
    cfg = config or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    manifest = load_manifest(index_dir) if resume else {"phases": {}, "metrics": {}, "config": None}
    if manifest["config"] not in (None, cfg.to_json()):
        raise ValueError("index_dir was built with a different config; pass resume=False")
    manifest["config"] = cfg.to_json()

    t_start = time.time()
    tf_path = os.path.join(index_dir, "tf.parquet")
    meta_path = os.path.join(index_dir, "docmeta.parquet")
    dict_path = os.path.join(index_dir, "dictionary.parquet")
    post_path = os.path.join(index_dir, "postings.parquet")
    lineage_path = os.path.join(index_dir, "lineage.parquet")

    base = docs if not cfg.id_cols else docs.withColumn("doc_id", F.xxhash64(*cfg.id_cols))
    base = base.withColumn("content_sha256", F.sha2(F.col(cfg.text_col), 256))
    # defensively widen narrow inputs so the tokenize stage uses every
    # core; wide inputs (the 100 TB case) pass through untouched
    target_par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < max(2, target_par // 2):
        base = base.repartition(target_par)

    # ---- phase 1: per-doc term frequencies (JVM codegen tokenize by
    # default; Arrow fused tokenize+count for pluggable Python tokenizers)
    if not _phase_done(manifest, "tf", tf_path):
        t0 = time.time()
        tf = _tokenize(base, cfg)
        tf.write.mode("overwrite").parquet(tf_path)
        n = spark.read.parquet(tf_path).count()
        manifest["phases"]["tf"] = {"rows": n, "wall_sec": time.time() - t0}
        _save_manifest(index_dir, manifest)
    tf = spark.read.parquet(tf_path)

    # ---- phase 2: doc metadata (+ doc_len, sha256 invariant)
    if not _phase_done(manifest, "docmeta", meta_path):
        t0 = time.time()
        doclens = termstats.doc_lengths(tf)
        meta = base.select(
            "doc_id", *cfg.id_cols, F.col(cfg.topic_col).alias("topic"), "content_sha256"
        ).join(doclens, "doc_id", "left").fillna(0, subset=["doc_len"])
        meta.write.mode("overwrite").parquet(meta_path)
        meta_r = spark.read.parquet(meta_path)
        n = meta_r.count()
        # duplicate natural keys (or a hash collision) would silently
        # merge tf rows and duplicate docmeta rows, corrupting postings
        # — same guard add_documents applies to deltas
        n_dup = meta_r.groupBy("doc_id").count().filter(F.col("count") > 1).count()
        if n_dup:
            raise ValueError(
                f"{n_dup} duplicate doc_ids in input (duplicate natural keys "
                f"{cfg.id_cols or '(doc_id column)'} or hash collision) — dedup the input first"
            )
        manifest["phases"]["docmeta"] = {"rows": n, "wall_sec": time.time() - t0}
        _save_manifest(index_dir, manifest)
    meta = spark.read.parquet(meta_path)

    # ---- phase 3: dictionary (salted two-phase cf/df) + totals
    if not _phase_done(manifest, "dictionary", dict_path):
        t0 = time.time()
        stats = termstats.global_term_stats(tf, n_salts=cfg.n_salts)
        stats.write.mode("overwrite").parquet(dict_path)
        stats_r = spark.read.parquet(dict_path)
        # totals derive from already-materialized aggregates — no extra
        # pass over the (huge) tf table: Σcf = token total, docmeta
        # carries doc count / doc_len sum / docs-with-terms
        srow = stats_r.agg(
            F.sum("cf").alias("tok"), F.count("*").alias("n_terms")
        ).collect()[0]
        dl = meta.agg(
            F.sum("doc_len").alias("s"),
            F.count("*").alias("n"),
            F.sum((F.col("doc_len") > 0).cast("long")).alias("nonempty"),
        ).collect()[0]
        n_docs_all = int(dl["n"])
        avgdl = float(int(dl["s"] or 0)) / n_docs_all if n_docs_all else 0.0
        manifest["phases"]["dictionary"] = {
            "rows": int(srow["n_terms"]),
            "wall_sec": time.time() - t0,
        }
        manifest["metrics"].update(
            total_tokens=int(srow["tok"] or 0),
            total_docs=n_docs_all,
            docs_with_terms=int(dl["nonempty"] or 0),
            avgdl=avgdl,
            skew_ratio=termstats.skew_ratio(stats_r),
        )
        _save_manifest(index_dir, manifest)
    stats = spark.read.parquet(dict_path)
    n_docs = int(manifest["metrics"]["total_docs"])
    avgdl = float(manifest["metrics"]["avgdl"])

    # ---- phase 4: encoded postings, doc-partitioned shards
    if not _phase_done(manifest, "postings", post_path):
        t0 = time.time()
        postings = encode_postings_df(tf, meta, stats, cfg, n_docs, avgdl)
        postings.write.mode("overwrite").partitionBy("shard").parquet(post_path)

        post_r = spark.read.parquet(post_path)
        lineage = post_r.groupBy("shard").agg(
            F.count("*").alias("n_lists"),
            F.sum("n_docs").alias("n_postings"),
            F.sum(F.length("docs_payload") + F.length("tfs_payload") + F.length("scores_payload")).alias("payload_bytes"),
        )
        lineage.write.mode("overwrite").parquet(lineage_path)
        lin = spark.read.parquet(lineage_path).agg(
            F.sum("n_postings").alias("p"), F.sum("payload_bytes").alias("bytes")
        ).collect()[0]
        wall = time.time() - t0
        manifest["phases"]["postings"] = {"rows": post_r.count(), "wall_sec": wall}
        manifest["metrics"].update(
            n_postings=int(lin["p"] or 0),
            payload_bytes=int(lin["bytes"] or 0),
            postings_per_sec=(int(lin["p"] or 0) / wall if wall > 0 else 0.0),
        )
        _save_manifest(index_dir, manifest)

    manifest["metrics"]["build_wall_sec_total"] = round(
        sum(p["wall_sec"] for p in manifest["phases"].values()), 3
    )
    manifest.setdefault("paths", _default_paths())
    _save_manifest(index_dir, manifest)
    return BuildResult(index_dir=index_dir, metrics=manifest["metrics"])


def _default_paths() -> dict:
    return {
        "tf": ["tf.parquet"],
        "docmeta": ["docmeta.parquet"],
        "dictionary": "dictionary.parquet",
        "postings": "postings.parquet",
        "lineage": "lineage.parquet",
    }


def index_paths(manifest: dict) -> dict:
    """Current relative artifact paths (versioned after add_documents)."""
    return manifest.get("paths") or _default_paths()


def _load_cfg(manifest: dict, index_dir: str) -> IndexConfig:
    if manifest["config"] is None:
        raise ValueError(f"{index_dir} has no built index")
    cj = dict(manifest["config"])
    cj["id_cols"] = tuple(cj.get("id_cols") or ())
    return IndexConfig(**cj)


def _tombstones(spark: SparkSession, index_dir: str, manifest: dict) -> DataFrame | None:
    rel = index_paths(manifest).get("tombstones")
    if not rel:
        return None
    return spark.read.parquet(os.path.join(index_dir, rel))


def _rebuild_derived(
    spark: SparkSession,
    index_dir: str,
    manifest: dict,
    cfg: IndexConfig,
    tf_all: DataFrame,
    meta_all: DataFrame,
    version: int,
    phase_name: str,
    t_start: float,
    paths_update: dict,
) -> BuildResult:
    """Recompute dictionary + postings (+ consolidated docmeta) over the
    given live tf/meta into versioned dirs, then flip the manifest
    pointers atomically.  Shared by add_documents / delete_documents."""
    dict_rel = f"dictionary_v{version}.parquet"
    post_rel = f"postings_v{version}.parquet"
    lin_rel = f"lineage_v{version}.parquet"
    meta_rel = f"docmeta_v{version}.parquet"

    meta_all.write.mode("overwrite").parquet(os.path.join(index_dir, meta_rel))
    meta_r = spark.read.parquet(os.path.join(index_dir, meta_rel))

    stats = termstats.global_term_stats(tf_all, n_salts=cfg.n_salts)
    stats.write.mode("overwrite").parquet(os.path.join(index_dir, dict_rel))
    stats_r = spark.read.parquet(os.path.join(index_dir, dict_rel))
    srow = stats_r.agg(F.sum("cf").alias("tok"), F.count("*").alias("n_terms")).collect()[0]
    dl = meta_r.agg(
        F.sum("doc_len").alias("s"), F.count("*").alias("n"),
        F.sum((F.col("doc_len") > 0).cast("long")).alias("nonempty"),
    ).collect()[0]
    n_docs_all = int(dl["n"])
    avgdl = float(int(dl["s"] or 0)) / n_docs_all if n_docs_all else 0.0

    postings = encode_postings_df(tf_all, meta_r, stats_r, cfg, n_docs_all, avgdl)
    postings.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(index_dir, post_rel)
    )
    post_r = spark.read.parquet(os.path.join(index_dir, post_rel))
    lineage = post_r.groupBy("shard").agg(
        F.count("*").alias("n_lists"),
        F.sum("n_docs").alias("n_postings"),
        F.sum(F.length("docs_payload") + F.length("tfs_payload") + F.length("scores_payload")).alias("payload_bytes"),
    )
    lineage.write.mode("overwrite").parquet(os.path.join(index_dir, lin_rel))
    lin = spark.read.parquet(os.path.join(index_dir, lin_rel)).agg(
        F.sum("n_postings").alias("p"), F.sum("payload_bytes").alias("bytes")
    ).collect()[0]

    wall = time.time() - t_start
    manifest["paths"] = {
        **index_paths(manifest),
        **paths_update,
        "docmeta": [meta_rel],
        "dictionary": dict_rel,
        "postings": post_rel,
        "lineage": lin_rel,
    }
    manifest["version"] = version
    manifest["phases"][phase_name] = {"rows": int(lin["p"] or 0), "wall_sec": wall}
    manifest["metrics"].update(
        total_tokens=int(srow["tok"] or 0),
        total_docs=n_docs_all,
        docs_with_terms=int(dl["nonempty"] or 0),
        avgdl=avgdl,
        skew_ratio=termstats.skew_ratio(stats_r),
        n_postings=int(lin["p"] or 0),
        payload_bytes=int(lin["bytes"] or 0),
        postings_per_sec=(int(lin["p"] or 0) / wall if wall > 0 else 0.0),
    )
    manifest["metrics"]["build_wall_sec_total"] = round(
        sum(p["wall_sec"] for p in manifest["phases"].values()), 3
    )
    _save_manifest(index_dir, manifest)
    return BuildResult(index_dir=index_dir, metrics=manifest["metrics"])


def add_documents(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
) -> BuildResult:
    """Incremental update: add documents to an existing index with
    EXACT global scores (BM25 idf/avgdl reflect the merged corpus).

    What is reused vs recomputed:
    - phase 1/2 of prior generations (tokenized tf + docmeta parquet)
      are reused as-is — the raw text of old documents is never
      re-scanned, which is the dominant cost at corpus scale;
    - the derived dictionary + postings are recomputed over the merged
      tf into NEW versioned dirs (dictionary_v<k>/postings_v<k>), then
      the manifest pointer flips atomically — readers opened before the
      flip keep a consistent old view.  (The LSM alternative — delta
      segments merged at query time — trades exact global idf for
      cheaper updates; rejected here because north_rule requires
      rank-identical scores.)

    Raises on doc_id collisions (same natural key already indexed, or
    previously deleted — re-adding a tombstoned id needs compaction).
    """
    manifest = load_manifest(index_dir)
    cfg = _load_cfg(manifest, index_dir)
    paths = index_paths(manifest)
    gen = len(paths["tf"])  # 1-based delta number
    version = int(manifest.get("version", 0)) + 1
    t_start = time.time()

    base = new_docs if not cfg.id_cols else new_docs.withColumn(
        "doc_id", F.xxhash64(*cfg.id_cols)
    )
    base = base.withColumn("content_sha256", F.sha2(F.col(cfg.text_col), 256))
    target_par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < max(2, target_par // 2):
        base = base.repartition(target_par)

    # ---- delta phase 1+2: tokenize + meta for the new docs only
    tf_rel, meta_rel = f"tf_g{gen}.parquet", f"docmeta_g{gen}.parquet"
    tf_new = _tokenize(base, cfg)
    tf_new.write.mode("overwrite").parquet(os.path.join(index_dir, tf_rel))
    tf_new = spark.read.parquet(os.path.join(index_dir, tf_rel))
    doclens_new = termstats.doc_lengths(tf_new)
    meta_new = base.select(
        "doc_id", *cfg.id_cols, F.col(cfg.topic_col).alias("topic"), "content_sha256"
    ).join(doclens_new, "doc_id", "left").fillna(0, subset=["doc_len"])
    meta_new.write.mode("overwrite").parquet(os.path.join(index_dir, meta_rel))
    meta_new = spark.read.parquet(os.path.join(index_dir, meta_rel))

    meta_old = spark.read.parquet(*[os.path.join(index_dir, p) for p in paths["docmeta"]])
    taken = meta_old.select("doc_id")
    tombs = _tombstones(spark, index_dir, manifest)
    if tombs is not None:
        taken = taken.unionByName(tombs.select("doc_id"))
    n_clash = meta_new.select("doc_id").join(taken, "doc_id").count()
    n_dup_new = (
        meta_new.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    if n_clash or n_dup_new:
        raise ValueError(
            f"doc_id collisions: {n_clash} vs existing index (live or tombstoned), "
            f"{n_dup_new} within new docs"
        )

    # ---- merged derived state -> versioned dirs
    tf_all = spark.read.parquet(
        *[os.path.join(index_dir, p) for p in paths["tf"]],
        os.path.join(index_dir, tf_rel),
    )
    if tombs is not None:
        tf_all = tf_all.join(tombs.select("doc_id"), "doc_id", "left_anti")
    meta_all = meta_old.unionByName(meta_new)
    return _rebuild_derived(
        spark, index_dir, manifest, cfg, tf_all, meta_all, version,
        f"delta_g{gen}", t_start, paths_update={"tf": paths["tf"] + [tf_rel]},
    )


def delete_documents(
    spark: SparkSession,
    doc_ids,
    index_dir: str,
) -> BuildResult:
    """Incremental delete with EXACT global scores: the doc_ids are
    tombstoned (their tokenized tf generations stay on disk but are
    filtered at every derived rebuild), and dictionary + postings are
    recomputed over the surviving documents — BM25 idf/df/avgdl reflect
    the post-delete corpus, identical to a from-scratch build without
    those docs (tests assert payload-level identity).

    ``doc_ids``: a one-column DataFrame or a Python sequence of ids.
    Raises if any id is not live in the index."""
    manifest = load_manifest(index_dir)
    cfg = _load_cfg(manifest, index_dir)
    paths = index_paths(manifest)
    version = int(manifest.get("version", 0)) + 1
    t_start = time.time()

    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.toDF("doc_id").distinct()
    else:
        ids = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long").distinct()

    meta_old = spark.read.parquet(*[os.path.join(index_dir, p) for p in paths["docmeta"]])
    n_missing = ids.join(meta_old.select("doc_id"), "doc_id", "left_anti").count()
    if n_missing:
        raise ValueError(f"{n_missing} doc_ids not live in the index")

    tomb_rel = f"tombstones_v{version}.parquet"
    tombs = _tombstones(spark, index_dir, manifest)
    all_tombs = ids if tombs is None else tombs.select("doc_id").unionByName(ids).distinct()
    all_tombs.write.mode("overwrite").parquet(os.path.join(index_dir, tomb_rel))
    all_tombs = spark.read.parquet(os.path.join(index_dir, tomb_rel))

    tf_all = spark.read.parquet(
        *[os.path.join(index_dir, p) for p in paths["tf"]]
    ).join(all_tombs, "doc_id", "left_anti")
    meta_all = meta_old.join(ids, "doc_id", "left_anti")
    return _rebuild_derived(
        spark, index_dir, manifest, cfg, tf_all, meta_all, version,
        f"delete_v{version}", t_start, paths_update={"tombstones": tomb_rel},
    )


def compact(spark: SparkSession, index_dir: str) -> BuildResult:
    """Consolidate all tf generations into one live parquet and clear
    the tombstone set (after which previously-deleted ids may be
    re-added).  Derived state is rebuilt from the compacted tf, so the
    result is indistinguishable from a fresh build over the live
    corpus; old generation/version dirs become garbage (left on disk —
    prune externally once no reader holds the old manifest)."""
    manifest = load_manifest(index_dir)
    cfg = _load_cfg(manifest, index_dir)
    paths = index_paths(manifest)
    version = int(manifest.get("version", 0)) + 1
    t_start = time.time()

    tombs = _tombstones(spark, index_dir, manifest)
    tf_all = spark.read.parquet(*[os.path.join(index_dir, p) for p in paths["tf"]])
    if tombs is not None:
        tf_all = tf_all.join(tombs.select("doc_id"), "doc_id", "left_anti")
    tf_rel = f"tf_compact_v{version}.parquet"
    tf_all.write.mode("overwrite").parquet(os.path.join(index_dir, tf_rel))
    tf_live = spark.read.parquet(os.path.join(index_dir, tf_rel))
    meta_live = spark.read.parquet(
        *[os.path.join(index_dir, p) for p in paths["docmeta"]]
    )
    res = _rebuild_derived(
        spark, index_dir, manifest, cfg, tf_live, meta_live, version,
        f"compact_v{version}", t_start, paths_update={"tf": [tf_rel]},
    )
    # tombstones are folded into the compacted tf -> drop the pointer
    m2 = load_manifest(index_dir)
    m2["paths"].pop("tombstones", None)
    _save_manifest(index_dir, m2)
    return res
