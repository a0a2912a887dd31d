"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the Iceberg-shaped input table from BASELINE.json:input_hint:

    repo: string, path: string, commit: string, lang: string, content: string

Identifiers are drawn from a Zipfian vocabulary so document-frequency
skew is realistic (the `if`/`return` hot-term problem the salted
aggregation in operators/termstats.py exists for).  Everything is seeded
— same seed, same corpus, across runs and machines (required by the
resume/rank-identity tests).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "go", "java", "rust", "c"]

# A handful of "flagged" identifiers planted into contents for the
# badwords-report analogue (FIXTURES.md F5; reference list at
# /root/reference/internal/badwords/data/english).
FLAGGED_TERMS = [
    "todo_hack", "fixme_now", "xxx_temp", "legacy_shim", "dirty_patch",
    "evil_cast", "unsafe_ptr", "kludge_fn", "magic_number", "dead_code",
    "foot_gun", "yolo_merge", "cursed_api", "spaghetti", "bitrot",
    "hack_alert", "wtf_flag", "bodge_fix", "jank_mode", "rotten_egg",
]


def _vocab(n_terms: int, seed: int) -> list[str]:
    rng = np.random.RandomState(seed)
    syllables = [
        "get", "set", "run", "map", "idx", "buf", "ptr", "ctx", "cfg", "len",
        "str", "val", "tmp", "arg", "obj", "fmt", "num", "vec", "node", "list",
        "data", "item", "pack", "read", "write", "sync", "lock", "hash", "byte",
        "code", "file", "path", "repo", "line", "word", "page", "util", "core",
    ]
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n_terms:
        k = rng.randint(2, 4)
        w = "_".join(rng.choice(syllables) for _ in range(k))
        if rng.rand() < 0.3:
            w = f"{w}{rng.randint(0, 100)}"
        if w not in seen and 3 <= len(w) <= 33:
            seen.add(w)
            vocab.append(w)
    return vocab


def make_code_files_pdf(
    n_docs: int = 5000,
    seed: int = 42,
    n_terms: int = 2000,
    zipf_a: float = 1.3,
    min_tokens: int = 50,
    max_tokens: int = 500,
    flagged_rate: float = 0.15,
    dup_rate: float = 0.02,
) -> pd.DataFrame:
    """Pandas frame of the F1 fixture (small scales; bench scale goes
    through :func:`make_code_files` which parallelizes the same logic)."""
    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab(n_terms, seed + 1))
    rows = []
    n_repos = max(2, n_docs // 500)
    for i in range(n_docs):
        repo = f"org{i % 3}/proj{i % n_repos}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/pkg{rng.randint(0, 20)}/file{i}.{lang[:2]}"
        commit = hashlib.sha1(f"{repo}:{i}:{seed}".encode()).hexdigest() + "deadbeef"[:0]
        commit = (commit + commit)[:40]
        n_tok = rng.randint(min_tokens, max_tokens + 1)
        # Zipf-distributed identifier draw (clipped into vocab range)
        idx = np.minimum(rng.zipf(zipf_a, size=n_tok) - 1, len(vocab) - 1)
        toks = list(vocab[idx])
        if rng.rand() < flagged_rate:
            k = rng.randint(1, 4)
            for f_t in rng.choice(FLAGGED_TERMS, size=k, replace=False):
                toks.insert(rng.randint(0, len(toks)), f_t)
        # a sprinkle of rare shared terms for conjunctive-query tests
        if i % 97 == 0:
            toks.append("rare_conjunct_alpha")
        if i % 194 == 0:
            toks.append("rare_conjunct_beta")
        content = _render(toks, lang, rng)
        rows.append((repo, path, commit, lang, content))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    # exact duplicates for dedup tests: copy content of earlier docs
    n_dup = int(n_docs * dup_rate)
    if n_dup:
        src = rng.randint(0, n_docs - n_dup, size=n_dup)
        dst = np.arange(n_docs - n_dup, n_docs)
        pdf.loc[dst, "content"] = pdf.loc[src, "content"].values
    return pdf


def _render(tokens: list[str], lang: str, rng: np.random.RandomState) -> str:
    """Wrap identifier stream in code-ish punctuation (punctuation is
    outside the token grammar, so it never affects term counts)."""
    out = []
    i = 0
    while i < len(tokens):
        k = min(len(tokens) - i, int(rng.randint(2, 6)))
        grp = tokens[i : i + k]
        style = rng.randint(0, 4)
        if style == 0:
            out.append(f"def {grp[0]}({', '.join(grp[1:])}):")
        elif style == 1:
            out.append(f"{grp[0]} = {'.'.join(grp[1:]) or '0'}")
        elif style == 2:
            out.append(f"if {grp[0]}: {' '.join(grp[1:])}")
        else:
            out.append("  ".join(grp))
        i += k
    return "\n".join(out)


def make_code_files(spark: SparkSession, n_docs: int = 5000, seed: int = 42, **kw) -> DataFrame:
    """Spark DataFrame of the F1 fixture (Arrow createDataFrame)."""
    pdf = make_code_files_pdf(n_docs=n_docs, seed=seed, **kw)
    return spark.createDataFrame(pdf)


def with_doc_id(docs: DataFrame) -> DataFrame:
    """Stable deterministic docID (SURVEY.md §4 risk 5): xxhash64 of the
    natural key — never ``monotonically_increasing_id`` (run-dependent).
    Collision-checked at test scale in tests/test_corpus.py."""
    return docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))


def with_sha256(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """Per-row invariant vs the reference (BASELINE.json:input_hint):
    the engine only ever derives from content, never mutates it."""
    return docs.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
