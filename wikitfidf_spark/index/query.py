"""BM25 top-k query engine over the sharded posting-list index.

Two physical strategies, both rank-identical (tests assert it):

- **wand** (the fast path): per-shard block-max WAND (Ding & Suel,
  SIGIR 2011) inside ``applyInPandas`` — a bounded min-heap per shard,
  lazy per-block posting decode with block skipping, integer quantized
  scores (bit-deterministic, see operators/scoring.py).  Because the
  index is document-partitioned, each shard's scores are complete, so
  the global answer is a k-row merge (``orderBy ... limit k`` =
  TakeOrderedAndProject over ≤ shards*k rows).
- **relational** (the oracle-checkable path): decode postings to
  (doc_id, term, tf, score_q) rows with ``mapInPandas``, then plain
  DataFrame agg + top-k.  Also serves the degenerate TF-IDF mode
  (BASELINE.json:north_star last sentence): reference formula
  tfidf = round4(tf/doc_len * log10(N/df)) per tfidf.go:100-103.

Queries run **batched**: one Spark job scores an arbitrary list of
queries (each shard task loops over the queries it has postings for) —
this is what makes q/s scale instead of paying per-query job overhead.

Tie-break everywhere: (score desc, doc_id asc) — SURVEY.md §7
rank-identity requirement.
"""

from __future__ import annotations

import heapq
import json
import math
import os
import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scoring import QUANT, round_half_up
from . import codec
from .build import load_manifest


class _List:
    """Cursor over one encoded posting list with lazy block decode."""

    __slots__ = (
        "firsts", "lasts", "counts", "maxes", "doc_offs", "score_offs",
        "docs_payload", "scores_payload", "starts", "n", "ub",
        "_blk", "_pos", "_docs", "_scores", "_exhausted",
    )

    def __init__(self, row) -> None:
        self.firsts = np.asarray(row["block_firsts"], dtype=np.int64)
        self.lasts = np.asarray(row["block_lasts"], dtype=np.int64)
        self.counts = np.asarray(row["block_counts"], dtype=np.int64)
        self.maxes = np.asarray(row["block_max_score"], dtype=np.int64)
        self.doc_offs = np.asarray(row["block_doc_offs"], dtype=np.int64)
        self.score_offs = np.asarray(row["block_score_offs"], dtype=np.int64)
        self.docs_payload = row["docs_payload"]
        self.scores_payload = row["scores_payload"]
        self.n = int(row["n_docs"])
        self.ub = int(self.maxes.max()) if len(self.maxes) else 0
        self._blk = -1
        self._pos = 0
        self._docs = None
        self._scores = None
        self._exhausted = self.n == 0
        if not self._exhausted:
            self._load_block(0)

    def _load_block(self, i: int) -> None:
        self._blk = i
        self._pos = 0
        self._docs = codec.decode_block_docs(
            self.docs_payload, self.firsts, self.counts, self.doc_offs, i
        )
        self._scores = None  # decoded only if the block is actually scored

    @property
    def exhausted(self) -> bool:
        return self._exhausted

    @property
    def cur_doc(self) -> int:
        return int(self._docs[self._pos])

    @property
    def cur_block_max(self) -> int:
        return int(self.maxes[self._blk])

    def cur_score(self) -> int:
        if self._scores is None:
            self._scores = codec.decode_block_stream(
                self.scores_payload, self.counts, self.score_offs, self._blk
            ).astype(np.int64)
        return int(self._scores[self._pos])

    def advance(self) -> None:
        self._pos += 1
        if self._pos >= len(self._docs):
            if self._blk + 1 < len(self.counts):
                self._load_block(self._blk + 1)
            else:
                self._exhausted = True

    def next_geq(self, target: int) -> None:
        """Advance to the first doc >= target (block skip via lasts)."""
        if self._exhausted:
            return
        if target <= self.cur_doc:
            return
        if target > int(self.lasts[self._blk]):
            nxt = int(np.searchsorted(self.lasts, target, side="left"))
            if nxt >= len(self.lasts):
                self._exhausted = True
                return
            self._load_block(nxt)
        self._pos += int(np.searchsorted(self._docs[self._pos:], target, side="left"))
        if self._pos >= len(self._docs):  # defensive; lasts bound should prevent
            self.advance()

    def block_boundary(self) -> int:
        """Last doc of the current block (for block-max skip targets)."""
        return int(self.lasts[self._blk])


class _TermCursor:
    """Groups the sub-shard lists of one term (disjoint doc sets).
    ``boost`` scales this term's impacts (and, critically, its upper
    bounds — WAND's pruning stays admissible because every bound is
    scaled by the same integer)."""

    __slots__ = ("lists", "ub", "boost")

    def __init__(self, lists: list[_List], boost: int = 1) -> None:
        self.lists = lists
        self.boost = boost
        self.ub = max((l.ub for l in lists), default=0) * boost

    @property
    def exhausted(self) -> bool:
        return all(l.exhausted for l in self.lists)

    @property
    def cur_doc(self) -> int:
        return min(l.cur_doc for l in self.lists if not l.exhausted)

    def cur_block_max(self) -> int:
        return max(l.cur_block_max for l in self.lists if not l.exhausted) * self.boost

    def next_geq(self, target: int) -> None:
        for l in self.lists:
            if not l.exhausted:
                l.next_geq(target)

    def score_and_advance_if_at(self, doc: int) -> int | None:
        """If positioned at ``doc``, return its score and advance."""
        s = None
        for l in self.lists:
            if not l.exhausted and l.cur_doc == doc:
                s = l.cur_score() * self.boost  # sub-lists disjoint: ≤1 hit
                l.advance()
        return s


def wand_top_k(
    term_rows: dict[str, list], k: int, mode: str = "OR",
    allowed: "np.ndarray | None" = None,
    excluded: "np.ndarray | None" = None,
    boosts: dict | None = None,
    msm: int = 0,
    after: "tuple[int, int] | None" = None,
) -> list[tuple[int, int]]:
    """Block-max WAND (OR) / skipping intersection (AND) over one shard.

    ``term_rows``: term -> list of encoded posting rows (sub-shards).
    ``allowed``: optional SORTED int64 array of permitted doc_ids
    (metadata filtering).  Block-max upper bounds hold for any doc
    subset, so the pruning logic is unchanged — the filter only snaps
    candidate targets forward to the next allowed doc, which ADDS skip
    distance (selective filters make WAND faster, not slower).
    ``excluded``: optional SORTED int64 array of forbidden doc_ids
    (must_not terms, pre-decoded by the caller): a pivot/intersection
    candidate in it is skipped past — scores of surviving docs are
    untouched.  ``msm`` (OR mode only): a doc must match at least this
    many DISTINCT query terms to qualify — score pruning stays
    admissible (the upper bound still dominates every candidate's true
    score; non-qualifying docs are simply never offered to the heap),
    and once fewer than ``msm`` live cursors remain no future doc can
    qualify, so evaluation stops early.  ``after``: cursor pagination —
    only docs strictly after ``(score_q, doc_id)`` in (score desc,
    doc asc) order are offered to the heap; score pruning stays
    admissible (upper bounds dominate every candidate regardless of
    the cursor, non-qualifying docs are simply never offered — same
    argument as msm).  Returns [(doc_id, score_q)] sorted by
    (score desc, doc asc), ≤ k.
    """
    if allowed is not None and not len(allowed):
        return []
    if excluded is not None and not len(excluded):
        excluded = None

    def is_excluded(doc: int) -> bool:
        i = int(np.searchsorted(excluded, doc))
        return i < len(excluded) and int(excluded[i]) == doc
    cursors = [
        _TermCursor(
            [_List(r) for r in rows],
            int(boosts.get(t, 1)) if boosts else 1,
        )
        for t, rows in term_rows.items()
    ]
    cursors = [c for c in cursors if not c.exhausted]
    n_terms = len(term_rows)
    heap: list[tuple[int, int]] = []  # (score_q, -doc_id) min-heap

    def offer(doc: int, score: int) -> None:
        if after is not None and (
            score > after[0] or (score == after[0] and doc <= after[1])
        ):
            return  # at or before the cursor — belongs to an earlier page
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    def next_allowed(doc: int) -> int | None:
        """Smallest allowed doc >= ``doc`` (None when the filter is
        exhausted — no future doc can match)."""
        i = int(np.searchsorted(allowed, doc))
        return int(allowed[i]) if i < len(allowed) else None

    if mode == "AND":
        if len(cursors) < n_terms or n_terms == 0:
            return []  # some term has no postings in this shard -> no doc can match
        while all(not c.exhausted for c in cursors):
            target = max(c.cur_doc for c in cursors)
            if allowed is not None:
                # snap to the next allowed doc: any candidate the
                # intersection lands on is in the filter by construction
                target_a = next_allowed(target)
                if target_a is None:
                    break
                target = target_a
            for c in cursors:
                c.next_geq(target)
            if any(c.exhausted for c in cursors):
                break
            if all(c.cur_doc == target for c in cursors):
                if excluded is not None and is_excluded(target):
                    for c in cursors:
                        c.next_geq(target + 1)
                    continue
                total = 0
                for c in cursors:
                    s = c.score_and_advance_if_at(target)
                    total += s or 0
                offer(target, total)
        out = sorted(heap, key=lambda t: (-t[0], -t[1]))
        return [(-d, s) for s, d in out]

    # ---- OR: block-max WAND (Ding & Suel 2011)
    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live or (msm and len(live) < msm):
            break
        live.sort(key=lambda c: c.cur_doc)
        theta = heap[0][0] if len(heap) >= k else 0
        full = len(heap) >= k
        acc = 0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.ub
            if not full or acc >= theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # sum of all upper bounds can't reach theta
        pivot_doc = live[pivot_idx].cur_doc
        # extend the pivot across lists tied at pivot_doc: they all
        # contribute to its score and must join the block-UB check
        while pivot_idx + 1 < len(live) and live[pivot_idx + 1].cur_doc == pivot_doc:
            pivot_idx += 1
        if live[0].cur_doc == pivot_doc:
            if allowed is not None:
                na = next_allowed(pivot_doc)
                if na is None:
                    break  # docs only grow: nothing allowed remains
                if na != pivot_doc:
                    # pivot fails the filter — jump every list at or
                    # before it straight to the next allowed doc
                    for c in live[: pivot_idx + 1]:
                        c.next_geq(na)
                    continue
            if excluded is not None and is_excluded(pivot_doc):
                for c in live[: pivot_idx + 1]:
                    c.next_geq(pivot_doc + 1)
                continue
            if full:
                # block-max refinement over every list at pivot_doc
                block_ub = sum(c.cur_block_max() for c in live[: pivot_idx + 1])
                if block_ub < theta:
                    # pivot_doc (and everything up to the shallowest
                    # block boundary, capped by the next list's cursor,
                    # which only lists 0..pivot can contain) can't win
                    boundary = min(
                        l.block_boundary()
                        for c in live[: pivot_idx + 1]
                        for l in c.lists
                        if not l.exhausted
                    )
                    d_next = boundary + 1
                    if pivot_idx + 1 < len(live):
                        d_next = min(d_next, live[pivot_idx + 1].cur_doc)
                    d_next = max(d_next, pivot_doc + 1)  # always progress
                    for c in live[: pivot_idx + 1]:
                        c.next_geq(d_next)
                    continue
            total = 0
            matched = 0
            for c in live[: pivot_idx + 1]:
                s = c.score_and_advance_if_at(pivot_doc)
                if s is not None:
                    matched += 1
                    total += s
            if not msm or matched >= msm:
                offer(pivot_doc, total)
        else:
            for c in live[:pivot_idx]:
                c.next_geq(pivot_doc)
    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-d, s) for s, d in out]


#: structure-half vs score-half column split for the unioned
#: two-file scan (the fused combined file carries all of them)
_STRUCT_COLS = (
    "n_docs", "docs_payload",
    "block_firsts", "block_lasts", "block_counts", "block_doc_offs",
)
_SCORE_COLS = ("scores_payload", "block_max_score", "block_score_offs")


def _merged_lists(pdf: pd.DataFrame) -> list[dict]:
    """Match a shard's structure half-rows with their score half-rows
    by (term, sub_shard); unpaired halves (can't happen in a consistent
    index) are dropped.  Rows from a fused combined-file scan already
    carry both halves and pass straight through.  Vectorized: the
    half-pairing is one pandas inner merge, not a per-row per-column
    Python loop (a 64-term OR over hot shards multiplies that loop)."""
    has_docs = pdf["docs_payload"].notna()
    has_scores = pdf["scores_payload"].notna()
    fused = has_docs & has_scores
    if fused.all():
        return pdf.to_dict("records")
    keys = ["term", "sub_shard"]
    extra = [c for c in pdf.columns if c not in keys
             and c not in _STRUCT_COLS and c not in _SCORE_COLS]
    s_half = pdf.loc[has_docs & ~has_scores,
                     keys + extra + list(_STRUCT_COLS)]
    c_half = pdf.loc[has_scores & ~has_docs, keys + list(_SCORE_COLS)]
    merged = s_half.merge(c_half, on=keys, how="inner")
    return pdf.loc[fused].to_dict("records") + merged.to_dict("records")


def _check_unique_qids(qids: "Iterable[int]") -> None:
    """Batch APIs key per-query limits and the final rank window on
    query_id — duplicate ids would silently merge two queries' results
    into one interleaved list, so they are rejected up front like every
    other malformed input."""
    seen: set[int] = set()
    dups: set[int] = set()
    for qid in qids:
        (dups if qid in seen else seen).add(qid)
    if dups:
        raise ValueError(f"duplicate query_id(s) in batch: {sorted(dups)}")


def wildcard_regex(pattern: str) -> tuple[str, str]:
    """Compile a shell-style wildcard term pattern to (anchored regex,
    literal prefix): ``*`` = any run of characters, ``?`` = exactly
    one, everything else literal.  The regex uses only ``.`` / ``.*`` /
    escaped literals, a fragment dialect Java regex (Spark RLIKE) and
    RE2 (DuckDB oracle) agree on.  The literal prefix (chars before the
    first wildcard) is returned separately so callers can push a
    ``StartsWith`` predicate into the dictionary scan."""
    if not pattern:
        raise ValueError("wildcard pattern must be non-empty")
    parts: list[str] = []
    prefix_len = 0
    seen_wild = False
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
            seen_wild = True
        elif ch == "?":
            parts.append(".")
            seen_wild = True
        else:
            parts.append(re.escape(ch))
            if not seen_wild:
                prefix_len += 1
    return "^" + "".join(parts) + "$", pattern[:prefix_len]


def _taat_kernel(
    pdf: pd.DataFrame, qspec: list, allowed_u: "np.ndarray | None"
) -> pd.DataFrame:
    """One shard's term-at-a-time evaluation for a query batch: decode
    each (term, sub_shard) list exactly once, mask to ``allowed_u`` if
    given, then per query np.unique + add.at + lexsort top-k with exact
    (score desc, doc asc) tie-break."""
    scored = {t for _, terms, *_ in qspec for t in terms}
    excl_only = {
        t for _, _, _, _, exclude, *_ in qspec for t in exclude
    } - scored
    return _taat_eval(_decode_shard(pdf, allowed_u, excl_only or None), qspec)


def _decode_shard(
    pdf: pd.DataFrame,
    allowed_u: "np.ndarray | None" = None,
    membership_only: "set[str] | None" = None,
) -> dict[str, list[tuple[np.ndarray, np.ndarray]]]:
    """Decode one shard's posting rows once — term → [(docs, scores)]
    per sub-shard list — optionally masked to ``allowed_u``.  Callers
    with PER-QUERY doc masks (the phrase batch) decode unmasked once
    and pass each query's mask to :func:`_taat_eval` instead, so a
    term shared by many queries is decoded exactly once per shard.
    ``membership_only`` terms (exclude-only: never scored by any query
    in the batch) skip the score varint stream entirely — same reason
    the WAND path uses the membership-only decode for its must_not
    masks; their entries carry ``scores=None``."""
    decoded: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
    for r in _merged_lists(pdf):
        if membership_only and r["term"] in membership_only:
            docs, scores = codec.decode_doc_ids(r), None
        else:
            docs, scores = codec.decode_docs_scores(r)
        if allowed_u is not None:
            keep = np.isin(docs, allowed_u)
            if not keep.all():
                docs = docs[keep]
                scores = scores[keep] if scores is not None else None
            if not len(docs):
                continue
        decoded.setdefault(r["term"], []).append((docs, scores))
    return decoded


def _taat_eval(
    decoded: dict[str, list[tuple[np.ndarray, np.ndarray]]],
    qspec: list,
    allowed_u: "np.ndarray | None" = None,
) -> pd.DataFrame:
    """Evaluate a query batch against an already-decoded shard.  An
    ``allowed_u`` mask here filters the concatenated (docs, scores)
    per query — equivalent to masking each decoded list (membership
    filtering commutes with concatenation; the AND count check runs
    after either way), without re-decoding per mask."""
    out_q, out_d, out_s = [], [], []
    for qid, terms, mode, k, exclude, boosts, excl_docs, msm, after in qspec:
        uniq_terms = sorted(set(terms))
        present = [t for t in uniq_terms if t in decoded]
        if not present:
            continue
        if mode == "AND" and len(present) < len(uniq_terms):
            continue
        if msm and len(present) < msm:
            continue  # a doc here can match at most len(present) terms
        d_parts = [d for t in present for d, _ in decoded[t]]
        if boosts:
            s_parts = [
                s * int(boosts.get(t, 1)) for t in present for _, s in decoded[t]
            ]
        else:
            s_parts = [s for t in present for _, s in decoded[t]]
        docs = np.concatenate(d_parts)
        scores = np.concatenate(s_parts)
        if allowed_u is not None:
            keep = np.isin(docs, allowed_u)
            if not keep.all():
                docs, scores = docs[keep], scores[keep]
            if not len(docs):
                continue
        if exclude:
            # docs containing ANY excluded term drop out; the excluded
            # terms never contribute to scoring (they are decoded only
            # for this membership mask)
            excl_parts = [d for t in exclude if t in decoded for d, _ in decoded[t]]
            if excl_parts:
                keep = np.isin(docs, np.concatenate(excl_parts), invert=True)
                docs, scores = docs[keep], scores[keep]
                if not len(docs):
                    continue
        if excl_docs is not None:
            keep = np.isin(docs, excl_docs, invert=True)
            if not keep.all():
                docs, scores = docs[keep], scores[keep]
                if not len(docs):
                    continue
        u, inv, cnt = np.unique(docs, return_inverse=True, return_counts=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, scores)
        if mode == "AND":
            # sub-lists of one term are doc-disjoint, so count ==
            # number of distinct matching terms
            m = cnt == len(present)
            u, sums = u[m], sums[m]
        elif msm > 1:
            # minimum-should-match: same distinct-term count, >= floor
            m = cnt >= msm
            u, sums = u[m], sums[m]
        if after is not None:
            # cursor pagination: only docs strictly after (score desc,
            # doc asc) cursor qualify — the local cut stays k
            a_s, a_d = after
            m = (sums < a_s) | ((sums == a_s) & (u > a_d))
            u, sums = u[m], sums[m]
        if not len(u):
            continue
        if len(u) > k:
            # top-k with exact (score desc, doc asc) tie-break: cut
            # with argpartition on score, widen the cut to include all
            # ties at the boundary, then sort
            part = np.argpartition(-sums, k - 1)[:k]
            thresh = sums[part].min()
            cand = np.flatnonzero(sums >= thresh)
        else:
            cand = np.arange(len(u))
        order = np.lexsort((u[cand], -sums[cand]))[:k]
        sel = cand[order]
        out_q.append(np.full(len(sel), qid, dtype=np.int32))
        out_d.append(u[sel])
        out_s.append(sums[sel])
    if not out_q:
        return pd.DataFrame(columns=["query_id", "doc_id", "score_q"])
    return pd.DataFrame({
        "query_id": np.concatenate(out_q),
        "doc_id": np.concatenate(out_d),
        "score_q": np.concatenate(out_s),
    })


@dataclass
class Query:
    query_id: int
    terms: list[str]
    mode: str = "OR"  # OR | AND
    k: int = 10
    # must_not terms: docs containing ANY of these are excluded from
    # the result; surviving docs' scores are untouched (the excluded
    # terms never contribute to scoring).  Exclusion is shard-local —
    # an excluded doc's postings live in the same doc-partitioned
    # shard as its scored postings.
    exclude: tuple[str, ...] = ()
    # per-term integer boosts aligned with ``terms`` (() = all 1):
    # score contribution of terms[i] is multiplied by boosts[i].
    # Integer so quantized scores stay exact and deterministic.
    boosts: tuple[int, ...] = ()
    # pagination: skip the first ``offset`` ranks, return the next k.
    # Each shard widens its local cut to offset+k (a doc at global
    # rank offset+i can be at local rank offset+i at worst), and the
    # global merge filters offset < rank <= offset+k — the returned
    # ``rank`` stays the ABSOLUTE rank, so page boundaries agree
    # across requests.
    offset: int = 0
    # specific doc ids excluded from THIS query's result (more-like-this
    # drops its own source doc this way).  Applied inside the per-shard
    # kernel BEFORE the local cut, so ranks come out final — no
    # ask-k+1-then-re-rank second window.
    exclude_docs: tuple[int, ...] = ()
    # minimum-should-match (OR mode only): a doc qualifies only if it
    # matches at least this many DISTINCT query terms; its score is
    # still the sum over ALL matched terms.  0 = no constraint (plain
    # OR); len(terms) = AND semantics with OR's missing-term tolerance
    # removed.  Shard-locality makes the per-shard check exact: a doc's
    # postings are complete within its shard, so a shard holding fewer
    # than msm of the query's terms can be skipped outright.
    min_should_match: int = 0
    # cursor pagination (Elasticsearch search_after): ``(score_q,
    # doc_id)`` of the LAST hit of the previous page.  Only docs
    # strictly after that cursor in (score desc, doc asc) order
    # qualify; each shard's local cut stays k — deep page P costs
    # O(k) per shard, not the O(offset+k) the ``offset`` path pays.
    # Mutually exclusive with ``offset``; returned ``rank`` is
    # relative to the cursor (1..k), as cursor pagination implies.
    search_after: tuple[int, int] | None = None


@dataclass
class PhraseQuery:
    """One phrase in a :meth:`InvertedIndex.phrase_topk_batch` batch:
    ``terms`` must appear as consecutive tokens (each gap relaxed to
    ordered proximity by ``slop``)."""
    query_id: int
    terms: list[str]
    k: int = 10
    slop: int = 0


class InvertedIndex:
    """Reader over an index directory produced by build.build_index."""

    def __init__(self, spark: SparkSession, index_dir: str) -> None:
        from .build import INDEX_FORMAT

        self.spark = spark
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        if self.manifest.get("format") != INDEX_FORMAT:
            raise ValueError(
                f"{index_dir} holds index format {self.manifest.get('format')} "
                f"(reader expects {INDEX_FORMAT}); rebuild with resume=False"
            )
        m = self.manifest["metrics"]
        self.n_docs = int(m["total_docs"])
        self.avgdl = float(m["avgdl"])
        # paths are manifest pointers: after add_documents they name the
        # current versioned dictionary/scores, the structure owner map
        # and the tf/docmeta generation list (build.index_paths).  The
        # logical postings table is structure ⋈ scores — both sides are
        # term-sorted within shards, and a term filter pushes into both
        # scans before the (small, post-filter) join.
        from .build import _read_scores, _read_structure, index_paths

        p = index_paths(self.manifest)
        self.structure = _read_structure(spark, index_dir, p)
        # single file after a full refresh, an owner map while
        # deferred-refresh deltas are outstanding (bounded staleness)
        self.scores = _read_scores(spark, index_dir, p)
        # fused single-file state (fresh build / post-compact before any
        # exact-mode update): structure and scores live in the SAME
        # combined-schema file — serve from ONE scan instead of scanning
        # it twice and re-pairing the halves.  This is the steady-state
        # serving layout; generation deltas fall back to the two-sided
        # plan below until the next compact.
        sc_p = p["scores"]
        self.combined = None
        if isinstance(sc_p, str) and set(p["structure"].values()) == {sc_p}:
            cand = spark.read.parquet(os.path.join(index_dir, sc_p))
            if "scores_payload" in cand.columns:
                self.combined = cand
        self.postings = (
            self.combined
            if self.combined is not None
            else self.structure.join(self.scores, ["shard", "term", "sub_shard"])
        )
        self.dictionary = spark.read.parquet(os.path.join(index_dir, p["dictionary"]))
        self.docmeta = spark.read.parquet(
            *[os.path.join(index_dir, d) for d in p["docmeta"]]
        )

    # ---------- batched top-k (TAAT default / WAND) ----------

    def topk_batch(
        self,
        queries: Sequence[Query],
        strategy: str = "taat",
        predicate: str | None = None,
    ) -> DataFrame:
        """One Spark job for all queries → (query_id, doc_id, score_q,
        score, rank); the global merge is a window top-k over
        ≤ n_shards*k rows per query.  Both strategies are exact and
        rank-identical (integer score sums, (score desc, doc asc) ties):

        - "taat" (default): decode every queried posting list ONCE per
          shard, then score each query vectorized (np.unique + add.at +
          lexsort).  Batched query mixes share hot terms, so
          decode-once amortizes across the batch; all inner work is
          numpy (term-at-a-time evaluation).
        - "wand": document-at-a-time block-max WAND with lazy block
          decode — fewer decoded blocks per query, Python-loop
          constant; wins for few queries over very long lists.

        ``predicate``: a SQL expression over docmeta columns
        restricting every query in the batch to matching docs.  The
        allowed ids are COGROUPED with the posting rows on shard
        (docmeta records each doc's shard, so the filter ids co-shuffle
        with exactly the postings that can contain them — no broadcast,
        no O(corpus) join).  TAAT applies them as a vectorized mask
        before the per-shard cut; WAND snaps its pivot targets to the
        next allowed doc (selective filters ADD skip distance).  Scores
        of surviving docs are untouched either way.
        """
        if strategy not in ("taat", "wand"):
            raise ValueError(f"unknown strategy {strategy!r}: use 'taat' or 'wand'")
        _check_unique_qids(q.query_id for q in queries)
        for q in queries:
            if not q.terms:
                # an empty term list would silently yield zero rows for
                # this qid — indistinguishable from "no matches"; the
                # sibling entry points (snippets, phrase_topk) raise too
                raise ValueError(f"query {q.query_id}: needs at least one term")
            if q.mode not in ("OR", "AND"):
                raise ValueError(f"query {q.query_id}: unknown mode {q.mode!r}: use 'OR' or 'AND'")
            if q.k < 1:
                raise ValueError(f"query {q.query_id}: k must be >= 1, got {q.k}")
            overlap = set(q.terms) & set(q.exclude)
            if overlap:
                raise ValueError(
                    f"query {q.query_id}: terms both scored and excluded: {sorted(overlap)}"
                )
            if q.offset < 0:
                raise ValueError(f"query {q.query_id}: offset must be >= 0, got {q.offset}")
            if q.search_after is not None:
                if q.offset:
                    raise ValueError(
                        f"query {q.query_id}: search_after and offset are mutually"
                        " exclusive (the cursor IS the page position)"
                    )
                if len(q.search_after) != 2:
                    raise ValueError(
                        f"query {q.query_id}: search_after must be (score_q, doc_id)"
                    )
            if q.min_should_match:
                if q.mode != "OR":
                    raise ValueError(
                        f"query {q.query_id}: min_should_match applies to OR queries"
                        " (AND already requires every term)"
                    )
                n_uniq = len(set(q.terms))
                if not (0 <= q.min_should_match <= n_uniq):
                    raise ValueError(
                        f"query {q.query_id}: min_should_match must be in"
                        f" [0, {n_uniq}], got {q.min_should_match}"
                    )
            if q.boosts:
                if len(q.boosts) != len(q.terms):
                    raise ValueError(
                        f"query {q.query_id}: {len(q.boosts)} boosts for {len(q.terms)} terms"
                    )
                if any(int(b) < 1 or int(b) != b for b in q.boosts):
                    raise ValueError(f"query {q.query_id}: boosts must be integers >= 1")
                bm = {}
                for t, b in zip(q.terms, q.boosts):
                    if bm.setdefault(t, int(b)) != int(b):
                        raise ValueError(
                            f"query {q.query_id}: term {t!r} has conflicting boosts"
                        )
        # excluded terms' postings are fetched too — their doc ids form
        # the shard-local must_not masks (never scored)
        all_terms = sorted(
            {t for q in queries for t in q.terms}
            | {t for q in queries for t in q.exclude}
        )
        if not {t for q in queries for t in q.terms}:
            return self._empty_result()
        qspec = [
            (
                q.query_id, list(q.terms), q.mode, q.k + q.offset, tuple(q.exclude),
                dict(zip(q.terms, (int(b) for b in q.boosts))) if q.boosts else None,
                np.asarray(sorted(set(map(int, q.exclude_docs))), dtype=np.int64)
                if q.exclude_docs else None,
                int(q.min_should_match),
                (int(q.search_after[0]), int(q.search_after[1]))
                if q.search_after is not None else None,
            )
            for q in queries
        ]
        # structure and scores rows are UNIONED (not JVM-joined) and
        # matched per (term, sub_shard) inside the per-shard group:
        # filters still push into both parquet scans, the one shuffle on
        # shard is unchanged, and the broadcast-build + join-probe cost
        # the join paid per batch disappears.  tfs/dls streams are
        # projected away BEFORE the shuffle — the scorers never read
        # them (~40% less bytes moved).
        rows = self._posting_rows(all_terms)

        def _wand_body(pdf: pd.DataFrame, allowed_u: "np.ndarray | None") -> pd.DataFrame:
            # one group = one doc-partitioned shard -> scores complete here
            by_term: dict[str, list] = {}
            for r in _merged_lists(pdf):
                by_term.setdefault(r["term"], []).append(r)
            excl_cache: dict[tuple, "np.ndarray | None"] = {}

            def excl_docs(exclude: tuple) -> "np.ndarray | None":
                if exclude not in excl_cache:
                    parts = [
                        codec.decode_doc_ids(r)  # membership only — no score decode
                        for t in exclude if t in by_term for r in by_term[t]
                    ]
                    excl_cache[exclude] = (
                        np.unique(np.concatenate(parts)) if parts else None
                    )
                return excl_cache[exclude]

            out = []
            for qid, terms, mode, k, exclude, boosts, excl_doc_ids, msm, after in qspec:
                rows_q = {t: by_term[t] for t in terms if t in by_term}
                if not rows_q:
                    continue
                if mode == "AND" and len(rows_q) < len(set(terms)):
                    continue
                if msm and len(rows_q) < msm:
                    continue  # a doc here can match at most len(rows_q) terms
                excluded = excl_docs(exclude) if exclude else None
                if excl_doc_ids is not None:
                    excluded = (
                        excl_doc_ids if excluded is None
                        else np.union1d(excluded, excl_doc_ids)
                    )
                for doc, score in wand_top_k(
                    rows_q, k, mode, allowed_u, excluded, boosts, msm, after
                ):
                    out.append((qid, doc, score))
            return pd.DataFrame(out, columns=["query_id", "doc_id", "score_q"])

        def per_shard_wand(key, pdf: pd.DataFrame) -> pd.DataFrame:
            return _wand_body(pdf, None)

        def per_shard_taat(key, pdf: pd.DataFrame) -> pd.DataFrame:
            return _taat_kernel(pdf, qspec, None)

        # cogrouped filtered variants: apdf holds this shard's allowed
        # doc ids with their native int64 dtype (a null-padded union
        # would route them through float64 and corrupt xxhash-range ids)
        def per_shard_taat_filtered(key, pdf: pd.DataFrame, apdf: pd.DataFrame) -> pd.DataFrame:
            return _taat_kernel(pdf, qspec, np.unique(apdf["doc_id"].to_numpy()))

        def per_shard_wand_filtered(key, pdf: pd.DataFrame, apdf: pd.DataFrame) -> pd.DataFrame:
            return _wand_body(pdf, np.unique(apdf["doc_id"].to_numpy()))

        out_schema = "query_id int, doc_id long, score_q long"
        if predicate is not None:
            allowed = self.docmeta.filter(predicate).select("shard", "doc_id")
            fn = per_shard_taat_filtered if strategy == "taat" else per_shard_wand_filtered
            local = (
                rows.groupBy("shard")
                .cogroup(allowed.groupBy("shard"))
                .applyInPandas(fn, out_schema)
            )
        else:
            per_shard = per_shard_taat if strategy == "taat" else per_shard_wand
            local = rows.groupBy("shard").applyInPandas(per_shard, out_schema)
        return self._rank_and_limit(
            local, {q.query_id: (q.k, q.offset) for q in queries}
        )

    def topk(
        self,
        terms: Sequence[str],
        k: int = 10,
        mode: str = "OR",
        search_after: tuple[int, int] | None = None,
    ) -> DataFrame:
        return self.topk_batch(
            [Query(0, list(terms), mode, k, search_after=search_after)]
        ).drop("query_id")

    # ---------- free-text entry: query-side analysis ----------

    def analyze(self, text: str) -> list[str]:
        """Normalize a free-text query EXACTLY like the index's build
        config: the identifier grammar, then the config's stemmer.  An
        index built with ``IndexConfig(stemmer=...)`` stores STEMS as
        its term space (build-side S7 fusion), so un-analyzed surface
        forms silently miss — query analysis must mirror the build, the
        same invariant the reference keeps by normalizing queries and
        documents through one code path (textnormalizer.pyx).  Returns
        order-preserving deduped terms (duplicate query terms would
        double-count in the OR sum)."""
        return list(dict.fromkeys(self.analyze_ordered(text)))

    def search(
        self,
        text: str,
        k: int = 10,
        mode: str = "OR",
        strategy: str = "taat",
        min_should_match: int = 0,
    ) -> DataFrame:
        """Free-text top-k: ``analyze`` the query through the index's
        own normalization, then serve it like any term query.  Text
        that normalizes to NOTHING (stopwords/short tokens only) is an
        empty result, not an error — unlike the term APIs, the caller
        didn't choose the term list.  For the same reason an
        ``min_should_match`` floor above the analyzed term count is an
        empty result (unsatisfiable), not a ValueError."""
        terms = self.analyze(text)
        # the unsatisfiable-msm shortcut applies only to OR — an
        # invalid AND+msm combination must reach topk_batch's
        # validation, not be masked as "no matches"
        if not terms or (
            mode == "OR" and min_should_match and min_should_match > len(terms)
        ):
            return self._empty_result().drop("query_id")
        return self.topk_batch(
            [Query(0, terms, mode, k, min_should_match=min_should_match)],
            strategy=strategy,
        ).drop("query_id")

    def analyze_ordered(self, text: str) -> list[str]:
        """:meth:`analyze` WITHOUT the dedup: phrase queries need the
        token stream in order with repeats (``"to be or not to be"``
        is a 6-term phrase, not 4 distinct terms)."""
        from ..tokenize import tokenize_py
        from .build import _load_cfg

        cfg = _load_cfg(self.manifest, self.index_dir)
        toks = tokenize_py(
            text, letters=cfg.token_letters, min_len=cfg.min_token_len,
            stopwords=frozenset(cfg.stopwords) if cfg.stopwords else None,
        )
        if cfg.stemmer and cfg.stemmer != "none":
            from ..operators.stemdict import STEMMERS

            stem = STEMMERS[cfg.stemmer]
            toks = [stem(t) for t in toks]
        return toks

    def search_phrase(self, text: str, k: int = 10, slop: int = 0) -> DataFrame:
        """Free-text phrase top-k: normalize the query through the
        index's own config (order-preserving, repeats kept) and serve
        it through :meth:`phrase_topk`."""
        return self.phrase_topk(self.analyze_ordered(text), k, slop=slop)

    def _posting_rows(self, all_terms: list[str]) -> DataFrame:
        """Term-pruned posting rows for the per-shard scorers: ONE
        combined-file scan in the fused state, else structure+scores
        scans unioned with null padding (matched back up per
        (term, sub_shard) by _merged_lists inside the shard group)."""
        term_filter = F.col("term").isin(all_terms)
        if self.combined is not None:
            return self.combined.filter(term_filter).select(
                "shard", "term", "sub_shard", "n_docs", "docs_payload",
                "block_firsts", "block_lasts", "block_counts", "block_doc_offs",
                "scores_payload", "block_max_score", "block_score_offs",
            )
        s_rows = self.structure.filter(term_filter).select(
            "shard", "term", "sub_shard", "n_docs", "docs_payload",
            "block_firsts", "block_lasts", "block_counts", "block_doc_offs",
        )
        c_rows = self.scores.filter(term_filter).select(
            "shard", "term", "sub_shard",
            "scores_payload", "block_max_score", "block_score_offs",
        )
        return s_rows.unionByName(c_rows, allowMissingColumns=True)

    def _rank_and_limit(self, local: DataFrame, kmap: dict) -> DataFrame:
        """Global merge: per-query window top-k over the ≤ shards*(k+off)
        shard-local results.  ``kmap`` values are k or (k, offset);
        ranks are absolute, the offset window filters
        offset < rank <= offset + k."""
        w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
        rows = [
            (qid, *(v if isinstance(v, tuple) else (v, 0)))
            for qid, v in kmap.items()
        ]
        ranked = local.withColumn("rank", F.row_number().over(w))
        if len(rows) <= 2000:
            # literal query_id->k/offset maps: a pure projection the
            # window stage absorbs — saves the per-call createDataFrame
            # round-trip and broadcast exchange the join path pays.
            # (A qid missing from the map compares null -> filtered,
            # same as the inner join; local only ever holds batch qids.)
            k_expr = F.create_map(
                *[F.lit(x) for qid, k, _ in rows for x in (qid, k)]
            )[F.col("query_id")]
            if any(off for _, _, off in rows):
                off_expr = F.create_map(
                    *[F.lit(x) for qid, _, off in rows for x in (qid, off)]
                )[F.col("query_id")]
            else:
                off_expr = F.lit(0)
            out = ranked.filter(
                (F.col("rank") > off_expr) & (F.col("rank") <= off_expr + k_expr)
            )
        else:
            kdf = self.spark.createDataFrame(rows, "query_id int, k int, off int")
            out = ranked.join(F.broadcast(kdf), "query_id").filter(
                (F.col("rank") > F.col("off")) & (F.col("rank") <= F.col("off") + F.col("k"))
            )
        return out.select(
            "query_id", "doc_id", "score_q",
            (F.col("score_q").cast("double") / F.lit(float(QUANT))).alias("score"),
            "rank",
        )

    def phrase_topk(
        self, terms: Sequence[str], k: int = 10, slop: int = 0
    ) -> DataFrame:
        """Exact-phrase top-k: docs containing ``terms`` as CONSECUTIVE
        tokens (tokenizer stream order), ranked by the sum of the
        terms' BM25 scores, (score desc, doc asc) ties — i.e. the AND
        query restricted to adjacency-verified docs.  ``slop`` relaxes
        each gap to ordered proximity (next term within 1+slop tokens).

        Plan: the positions artifact (build_positions) and the posting
        rows are both term-pruned scans COGROUPED on shard — positions
        rows co-shuffle with exactly the posting shards that can hold
        their docs (placement comes from docmeta on both sides), no
        broadcast, no O(corpus) join.  Adjacency is verified per shard
        with the vectorized int64-packed intersect chain
        (positions.verify_phrase_docs), then the standard TAAT kernel
        scores the surviving docs; the global merge is the usual
        ≤ shards*k window."""
        return self.phrase_topk_batch(
            [PhraseQuery(0, list(terms), k, slop)]
        ).drop("query_id")

    def phrase_topk_batch(self, phrases: Sequence[PhraseQuery]) -> DataFrame:
        """One Spark job for a batch of phrase queries → (query_id,
        doc_id, score_q, score, rank).  Same plan shape as a single
        :meth:`phrase_topk` — ONE term-pruned positions scan + ONE
        posting scan cogrouped on shard — so the per-batch fixed cost
        (two scans, one shuffle, one merge window) is paid once for the
        whole batch instead of once per phrase (the difference between
        ~1 q/s and serving-rate phrase search)."""
        from .build import index_paths
        from .positions import verify_phrase_grouped

        phrases = list(phrases)
        _check_unique_qids(q.query_id for q in phrases)
        for q in phrases:
            if len(q.terms) < 2:
                raise ValueError(f"query {q.query_id}: phrase needs at least 2 terms")
            if q.k < 1:
                raise ValueError(f"query {q.query_id}: k must be >= 1, got {q.k}")
            if q.slop < 0:
                raise ValueError(f"query {q.query_id}: slop must be >= 0, got {q.slop}")
        p = index_paths(self.manifest)
        rel = p.get("positions")
        if not rel:
            raise ValueError(
                "index has no positions artifact — run build_positions first"
            )
        if int(self.manifest.get("positions_version", -1)) != int(
            self.manifest.get("version", 0)
        ):
            raise ValueError(
                "positions artifact is stale (built at index version "
                f"{self.manifest.get('positions_version')}, index is at "
                f"{self.manifest.get('version', 0)}) — rebuild positions"
            )
        from .positions import read_positions

        all_terms = sorted({t for q in phrases for t in q.terms})
        pos_rows = read_positions(self.spark, self.index_dir, rel).filter(
            F.col("term").isin(all_terms)
        )
        rows = self._posting_rows(all_terms)
        qspec = [(q.query_id, list(q.terms), q.k, q.slop) for q in phrases]

        def per_shard_phrase(key, pdf: pd.DataFrame, ppdf: pd.DataFrame) -> pd.DataFrame:
            # shard-level work is paid ONCE for the batch: postings are
            # decoded once for the union of phrase terms (a term shared
            # by many phrases is not re-decoded per phrase) and the
            # positions rows are grouped by term once; each phrase then
            # verifies adjacency over the shared grouping and scores
            # against the shared decode with its own allowed mask.
            decoded = _decode_shard(pdf)
            pos_by_term: dict[str, list] = {}
            for r in ppdf.itertuples(index=False):
                pos_by_term.setdefault(r.term, []).append((r.doc_id, r.poss))
            out = []
            for qid, terms, k, slop in qspec:
                allowed = verify_phrase_grouped(pos_by_term, terms, slop)
                if not len(allowed):
                    continue
                out.append(_taat_eval(
                    decoded, [(qid, terms, "AND", k, (), None, None, 0, None)], allowed,
                ))
            if not out:
                return pd.DataFrame(columns=["query_id", "doc_id", "score_q"])
            return pd.concat(out, ignore_index=True)

        local = (
            rows.groupBy("shard")
            .cogroup(pos_rows.groupBy("shard"))
            .applyInPandas(per_shard_phrase, "query_id int, doc_id long, score_q long")
        )
        return self._rank_and_limit(local, {q.query_id: q.k for q in phrases})

    def snippets(
        self,
        docs: DataFrame,
        terms: Sequence[str],
        k: int = 10,
        mode: str = "OR",
        window: int = 12,
        before: int = 3,
        text_col: str = "content",
        id_col: str = "doc_id",
        strategy: str = "wand",
        predicate: str | None = None,
    ) -> DataFrame:
        """Result-page snippets: BM25 top-k (any engine strategy, with
        optional metadata ``predicate``), each hit joined back to its
        source text and cut to a deterministic token window — the
        ``window`` tokens starting ``before`` tokens ahead of the
        EARLIEST occurrence of any query term (1-clamped).

        The extraction is entirely JVM-side codegen (tokenize =
        regexp_extract_all, locate = array_position, cut = slice +
        array_join — no UDF): the expensive part is the ``docs`` scan,
        and the ≤k hit ids are broadcast into it so the corpus never
        shuffles.  At 10^12 docs serve text from a point-lookup store
        (bucketed by doc_id) instead of a flat scan; the join shape is
        unchanged.  Stemmed indexes locate the stem's literal form
        only — docs whose surface forms all differ fall back to the
        document head (coalesce to position 1 keeps the row).
        Delegates to :meth:`snippets_batch` with one query — one code
        path for the window semantics."""
        if not terms:
            # e.g. analyze() of a stopword-only query — fail clean
            raise ValueError("snippets needs at least one term")
        return self.snippets_batch(
            docs,
            [Query(0, list(terms), mode, k)],
            window=window,
            before=before,
            text_col=text_col,
            id_col=id_col,
            strategy=strategy,
            predicate=predicate,
        ).drop("query_id")

    def snippets_batch(
        self,
        docs: DataFrame,
        queries: Sequence[Query],
        window: int = 12,
        before: int = 3,
        text_col: str = "content",
        id_col: str = "doc_id",
        strategy: str = "wand",
        predicate: str | None = None,
    ) -> DataFrame:
        """Result-page snippets for a QUERY batch in one job →
        (query_id, doc_id, score_q, rank, snippet).  One
        :meth:`topk_batch` scores every query, the per-query term
        arrays ride the (small) hit set as a broadcast column, and the
        docs table is scanned ONCE for the union of hits — the per-hit
        window cut is the same JVM expression as :meth:`snippets`,
        with the literal-term ``least`` replaced by an
        ``array_min(filter(transform(...)))`` over the row's own term
        array (still whole-stage codegen, no UDF).  Row-identical per
        query to the single-call path (equivalence-tested)."""
        from ..tokenize import tokens_col

        if window < 1 or before < 0:
            raise ValueError(f"window must be >= 1 and before >= 0, got {window}/{before}")
        if id_col not in docs.columns:
            from .build import _load_cfg

            cfg = _load_cfg(self.manifest, self.index_dir)
            if not cfg.id_cols:
                raise ValueError(
                    f"docs has no {id_col!r} column and the index config "
                    "declares no natural-key id_cols to derive it from"
                )
            docs = docs.withColumn(id_col, F.xxhash64(*cfg.id_cols))
        hits = self.topk_batch(queries, strategy=strategy, predicate=predicate).select(
            "query_id", "doc_id", "score_q", "rank"
        )
        qt = self.spark.createDataFrame(
            [(int(q.query_id), sorted(set(q.terms))) for q in queries],
            "query_id int, qterms array<string>",
        )
        hits = hits.join(F.broadcast(qt), "query_id")
        toks = tokens_col(F.col(text_col))
        first = F.array_min(
            F.filter(
                F.transform(
                    F.col("qterms"),
                    lambda t: F.nullif(F.array_position(toks, t), F.lit(0)),
                ),
                lambda x: x.isNotNull(),
            )
        )
        start = F.greatest(
            F.lit(1), (F.coalesce(first, F.lit(1)) - F.lit(before)).cast("int")
        )
        snip = F.array_join(F.slice(toks, start, window), " ")
        return (
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            .join(F.broadcast(hits), "doc_id")
            .select("query_id", "doc_id", "score_q", "rank", snip.alias("snippet"))
        )

    def more_like_this(
        self,
        doc_id: int,
        m: int = 8,
        k: int = 10,
        strategy: str = "wand",
        predicate: str | None = None,
    ) -> DataFrame:
        """Find documents similar to ``doc_id``: extract its ``m``
        strongest terms by reference TF-IDF (round4(tf/doc_len *
        log10(N/df)), ties term-asc) and run them as a BM25 OR query,
        excluding the source doc itself (optionally AND-ed with an
        extra docmeta ``predicate``).

        Term extraction never touches the term-major postings: the tf
        artifact is doc-major, so the source doc's rows are a
        predicate-pushdown point lookup; df comes from the dictionary
        broadcast (epoch dictionary during a deferred-refresh window,
        with a structure-derived live-df fallback for delta-only
        terms), doc_len from the doc's docmeta row.  The
        m query terms come to the driver (m is tiny — queries are
        driver-side objects by definition), then the standard batched
        engine serves the top-k."""
        return (
            self.more_like_this_batch(
                [doc_id], m=m, k=k, strategy=strategy, predicate=predicate
            )
            .drop("query_id", "src_doc_id")
        )

    def more_like_this_batch(
        self,
        doc_ids: Sequence[int],
        m: int = 8,
        k: int = 10,
        strategy: str = "wand",
        predicate: str | None = None,
    ) -> DataFrame:
        """More-like-this for a batch of source docs in ONE pipeline →
        (query_id, src_doc_id, doc_id, score_q, score, rank).

        Term extraction batches too: the doc-major tf artifact is
        scanned ONCE with an ``isin`` pushdown for all sources, joined
        to the broadcast dictionary, and the per-doc top-``m`` terms
        come back in one window + one collect (≤ m·|docs| rows — query
        construction is driver-side by definition).  Serving is one
        :meth:`topk_batch`; each query's own source doc is excluded
        structurally (ask k+1, drop the source row, re-rank — identical
        results to a per-query ``doc_id != src`` predicate, without
        per-query predicates)."""
        from .build import _tombstones, index_paths

        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        doc_ids = [int(d) for d in doc_ids]
        # dedupe for the extraction phase: a repeated source doc must
        # not duplicate its tf rows through the lens join below (the
        # per-doc window would rank each term twice and the top-m would
        # hold ~m/2 distinct terms); the query list further down stays
        # per-input-position, so duplicates still get their own query
        uniq_ids = list(dict.fromkeys(doc_ids))
        meta = {
            r["doc_id"]: int(r["doc_len"])
            for r in self.docmeta.filter(F.col("doc_id").isin(uniq_ids))
            .select("doc_id", "doc_len").collect()
        }
        missing = [d for d in uniq_ids if d not in meta]
        if missing:
            raise ValueError(f"doc_ids not live in the index: {missing}")
        p = index_paths(self.manifest)
        tf = self.spark.read.parquet(
            *[os.path.join(self.index_dir, t) for t in p["tf"]]
        ).filter(F.col("doc_id").isin(uniq_ids))
        tombs = _tombstones(self.spark, self.index_dir, self.manifest)
        if tombs is not None:  # docmeta said live, so this is belt+braces
            tf = tf.join(tombs.select("doc_id"), "doc_id", "left_anti")
        lens = self.spark.createDataFrame(
            [(d, meta[d]) for d in uniq_ids], "doc_id long, doc_len long"
        )
        # During a bounded-staleness window the epoch dictionary lacks
        # terms that exist only in un-refreshed deltas; an inner join
        # would silently drop them from the ranking (a delta doc with
        # only new terms would return NO results).  Same guard as
        # tfidf_scores: left join + structure-derived live df — gated
        # on the manifest so the common refreshed path stays one inner
        # broadcast join with no extra scan.
        if int(self.manifest.get("stale_deltas", 0)) > 0:
            fallback_df = self.structure.groupBy("term").agg(
                F.sum("n_docs").alias("df_live")
            )
            dicted = (
                tf.join(F.broadcast(self.dictionary.select("term", "df")), "term", "left")
                .join(F.broadcast(fallback_df), "term")
                .withColumn("df", F.coalesce("df", "df_live"))
            )
        else:
            dicted = tf.join(
                F.broadcast(self.dictionary.select("term", "df")), "term"
            )
        scored = dicted.join(F.broadcast(lens), "doc_id").withColumn(
            "tfidf",
            round_half_up(
                (F.col("tf").cast("double") / F.col("doc_len").cast("double"))
                * F.log10(F.lit(float(self.n_docs)) / F.col("df").cast("double")),
                4,
            ),
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
        top_terms: dict[int, list[str]] = {}
        for r in (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= m).select("doc_id", "term", "r")
            .orderBy("doc_id", "r").collect()
        ):
            top_terms.setdefault(r["doc_id"], []).append(r["term"])
        queries, src_of = [], {}
        for i, d in enumerate(doc_ids):
            terms = top_terms.get(d)
            if terms:  # a stopword-only doc yields no query
                src_of[i] = d
                # source exclusion rides the kernel (Query.exclude_docs):
                # the shard cut never sees the source doc, so
                # topk_batch's ranks are already final — no k+1 ask, no
                # second rank window over the served rows
                queries.append(Query(i, terms, "OR", k, exclude_docs=(d,)))
        if not queries:
            return (
                self._empty_result()
                .withColumn("src_doc_id", F.lit(None).cast("long"))
                .select("query_id", "src_doc_id", "doc_id", "score_q", "score", "rank")
            )
        res = self.topk_batch(queries, strategy=strategy, predicate=predicate)
        if len(src_of) <= 2000:
            # literal qid->source map: labeling is a projection, not a
            # broadcast-join stage
            src_expr = F.create_map(
                *[F.lit(x) for qid, d in src_of.items() for x in (qid, d)]
            )[F.col("query_id")].cast("long")
            res = res.withColumn("src_doc_id", src_expr)
        else:
            src_df = self.spark.createDataFrame(
                [(qid, d) for qid, d in src_of.items()], "query_id int, src_doc_id long"
            )
            res = res.join(F.broadcast(src_df), "query_id")
        return res.select(
            "query_id", "src_doc_id", "doc_id", "score_q", "score", "rank"
        )

    # ---------- dictionary services ----------

    def prefix_terms(self, prefix: str, n: int = 10) -> DataFrame:
        """Term-dictionary prefix search (the autocomplete primitive):
        the ``n`` highest-df terms starting with ``prefix``, ties
        term-asc.  Pure JVM: ``StartsWith`` pushes into the dictionary
        parquet scan (only term/df/cf columns read), and the top-n is a
        TakeOrderedAndProject over the filtered rows — no shuffle of
        the full vocabulary.  The dictionary is O(vocab), not
        O(corpus), so this stays cheap at any corpus size."""
        if not prefix:
            raise ValueError("prefix must be non-empty (the full dictionary is .dictionary)")
        return (
            self.dictionary.filter(F.col("term").startswith(prefix))
            .select("term", "df", "cf")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(n)
        )

    def prefix_terms_batch(
        self, prefixes: Sequence[tuple[int, str]], n: int = 10
    ) -> DataFrame:
        """Prefix search for a batch of (query_id, prefix) panels in ONE
        job → (query_id, term, df, cf) — the autocomplete serving shape
        (one keystroke tick fans out many live prefix panels).  Plan:
        the prefix panel broadcasts against the O(vocab) dictionary
        with a ``StartsWith`` theta-join (vocab × |batch| predicate
        evaluations, whole-stage codegen — no Python, no shuffle of the
        vocabulary), then one rank window per query replaces the
        per-call TakeOrdered.  Row-identical to :meth:`prefix_terms`
        per query (same (df desc, term asc) cut)."""
        prefixes = [(int(qid), p) for qid, p in prefixes]
        _check_unique_qids(qid for qid, _ in prefixes)
        if any(not p for _, p in prefixes):
            raise ValueError("prefix must be non-empty (the full dictionary is .dictionary)")
        pdf = self.spark.createDataFrame(prefixes, "query_id int, prefix string")
        w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
        return (
            self.dictionary.select("term", "df", "cf")
            .join(F.broadcast(pdf), F.col("term").startswith(F.col("prefix")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(n))
            .select("query_id", "term", "df", "cf")
            .orderBy("query_id", F.desc("df"), F.asc("term"))
        )

    def expand_wildcard(self, pattern: str, max_expansions: int = 32) -> DataFrame:
        """Wildcard term expansion over the dictionary (Lucene's
        multi-term rewrite primitive): ``*`` matches any run of
        characters, ``?`` exactly one.  Returns the ``max_expansions``
        highest-df matching terms (ties term-asc) as (term, df, cf).
        Plan: the literal prefix before the first wildcard pushes into
        the dictionary parquet scan as ``StartsWith`` (row-group
        pruning on the term-sorted dictionary), the anchored match runs
        as a JVM ``RLIKE`` over the survivors (whole-stage codegen, no
        Python), and the cut is a TakeOrderedAndProject — O(prefix
        range) for anchored patterns, O(vocab) worst case for
        leading-wildcard ones, never O(corpus).  The deterministic
        df-ranked cap bounds downstream scoring cost no matter how
        broad the pattern (Lucene's top-terms rewrite)."""
        if max_expansions < 1:
            raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
        rx, prefix = wildcard_regex(pattern)
        d = self.dictionary.select("term", "df", "cf")
        if prefix:
            d = d.filter(F.col("term").startswith(prefix))
        return (
            d.filter(F.col("term").rlike(rx))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
        )

    def wildcard_topk(
        self,
        pattern: str,
        k: int = 10,
        max_expansions: int = 32,
        min_should_match: int = 0,
    ) -> DataFrame:
        """BM25 top-k for a wildcard pattern: expand against the
        dictionary (:meth:`expand_wildcard`'s deterministic df-ranked
        cap), then score the expansion as ONE disjunctive query →
        (doc_id, score_q, score, rank).  The expansion collect is
        bounded by ``max_expansions`` (≤32 rows by default — a
        dictionary lookup, not a corpus scan); ``min_should_match``
        optionally requires docs to match several distinct expanded
        terms — a floor above the expansion width is unsatisfiable and
        returns no matches rather than silently weakening."""
        terms = [
            r["term"] for r in self.expand_wildcard(pattern, max_expansions).collect()
        ]
        # an msm above the expansion width is unsatisfiable — return no
        # matches (Lucene semantics), never silently weaken the floor
        if not terms or (min_should_match and min_should_match > len(terms)):
            return self._empty_result().drop("query_id")
        return self.topk_batch(
            [Query(0, terms, "OR", k, min_should_match=min_should_match)]
        ).drop("query_id")

    def wildcard_topk_batch(
        self,
        panels: Sequence[tuple[int, str]],
        k: int = 10,
        max_expansions: int = 32,
    ) -> DataFrame:
        """Wildcard search for a batch of (query_id, pattern) panels:
        ONE dictionary job expands every pattern (the panel broadcasts
        against the O(vocab) dictionary with a ``regexp_like`` + prefix
        theta-join, whole-stage codegen; one rank window per panel
        applies the (df desc, term asc) cap), then ONE ``topk_batch``
        scores all expansions.  The intermediate collect is bounded by
        ``|panels| * max_expansions`` dictionary rows.  Row-identical
        per panel to :meth:`wildcard_topk` (equivalence-tested); a
        panel whose pattern matches nothing yields no rows."""
        panels = [(int(qid), p) for qid, p in panels]
        _check_unique_qids(qid for qid, _ in panels)
        compiled = [
            (qid, *wildcard_regex(p)) for qid, p in panels
        ]  # raises on an empty pattern, like expand_wildcard
        if max_expansions < 1:
            raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
        pdf = self.spark.createDataFrame(
            compiled, "query_id int, rx string, prefix string"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
        exp = (
            self.dictionary.select("term", "df")
            .join(
                F.broadcast(pdf),
                F.col("term").startswith(F.col("prefix"))
                & F.regexp_like(F.col("term"), F.col("rx")),
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= F.lit(max_expansions))
            .select("query_id", "term")
            .collect()
        )
        by_qid: dict[int, list[str]] = {}
        for r in exp:
            by_qid.setdefault(r["query_id"], []).append(r["term"])
        if not by_qid:
            return self._empty_result()
        return self.topk_batch(
            [Query(qid, terms, "OR", k) for qid, terms in sorted(by_qid.items())]
        )

    def suggest(self, query_term: str, max_dist: int = 1, n: int = 10) -> DataFrame:
        """Spell-suggest over the term dictionary: terms within
        ``max_dist`` Levenshtein edits of ``query_term``, ranked
        (distance asc, df desc, term asc).  The length band
        ``|len(term) − len(q)| ≤ max_dist`` is a necessary condition
        for edit distance ≤ max_dist, so it prunes the vocabulary
        BEFORE the O(len²) distance — both predicates and
        ``levenshtein`` itself run JVM-side (whole-stage codegen), no
        Python in the loop."""
        if max_dist < 0:
            raise ValueError(f"max_dist must be >= 0, got {max_dist}")
        qlen = len(query_term)
        return (
            self.dictionary.filter(
                F.abs(F.length("term") - F.lit(qlen)) <= F.lit(max_dist)
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(query_term)))
            .filter(F.col("dist") <= F.lit(max_dist))
            .select("term", "dist", "df")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(n)
        )

    def suggest_batch(
        self, queries: Sequence[tuple[int, str]], max_dist: int = 1, n: int = 10
    ) -> DataFrame:
        """Spell-suggest for a batch of (query_id, term) lookups in ONE
        job → (query_id, term, dist, df).  The length band
        ``|len(term) − len(q)| ≤ max_dist`` rides the broadcast
        theta-join condition, so the O(len²) ``levenshtein`` only runs
        on banded (term, query) pairs — all JVM codegen, one dictionary
        scan for the whole batch instead of one per call.  Row-identical
        to :meth:`suggest` per query (same (dist asc, df desc, term
        asc) cut)."""
        if max_dist < 0:
            raise ValueError(f"max_dist must be >= 0, got {max_dist}")
        queries = [(int(qid), q) for qid, q in queries]
        _check_unique_qids(qid for qid, _ in queries)
        qdf = self.spark.createDataFrame(queries, "query_id int, q string")
        w = Window.partitionBy("query_id").orderBy(
            F.asc("dist"), F.desc("df"), F.asc("term")
        )
        return (
            self.dictionary.select("term", "df")
            .join(
                F.broadcast(qdf),
                F.abs(F.length("term") - F.length("q")) <= F.lit(max_dist),
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.col("q")))
            .filter(F.col("dist") <= F.lit(max_dist))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(n))
            .select("query_id", "term", "dist", "df")
            .orderBy("query_id", F.asc("dist"), F.desc("df"), F.asc("term"))
        )

    def significant_terms(
        self, terms: Sequence[str], n: int = 10, min_fg_df: int = 2
    ) -> DataFrame:
        """Significant-terms aggregation (Elasticsearch
        ``significant_terms``): the terms most over-represented in the
        OR-match set relative to the background corpus →
        (term, fg_df, bg_df, lift), top-n by (lift desc, fg_df desc,
        term asc), query terms excluded, ``fg_df >= min_fg_df``
        (rare-term noise floor).

        ``lift = (fg_df · N) / (bg_df · m)`` — foreground rate over
        background rate, computed as exact integer products divided
        ONCE (IEEE division is correctly rounded, so the score is
        bit-identical across engines; deliberately NOT the JLH/chi²
        log shapes, whose libm transcendentals differ).

        Plan: membership-only decode of the queried postings →
        distinct match set; ONE scan of the tf generations (column-
        pruned to (doc_id, term), tombstone-anti-joined) semi-joined
        to the match set → fg_df per term; the (match-vocab-sized) fg
        table joins the dictionary for bg_df; the match count rides a
        broadcast one-row agg, never a collect.  During a bounded-
        staleness window bg_df falls back to structure-derived live df
        (same guard as more_like_this) so delta-only terms stay
        scored.  Delegates to :meth:`significant_terms_batch` with
        one panel — one code path for the lift semantics."""
        if not list(terms):
            raise ValueError("needs at least one term")
        return (
            self.significant_terms_batch([(0, list(terms))], n=n, min_fg_df=min_fg_df)
            .drop("query_id")
        )

    def significant_terms_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        n: int = 10,
        min_fg_df: int = 2,
    ) -> DataFrame:
        """Significant-terms panels for a batch of (query_id, terms) in
        ONE job → (query_id, term, fg_df, bg_df, lift), top-n per panel.
        The shared :meth:`_panel_match_sets` membership decode builds
        every panel's match set at once; ONE tombstone-clean
        tf-generation scan joins the (query_id, doc_id) match table
        (per-panel fg counts in one partial agg); per-panel match
        counts and the dictionary bg_df ride broadcast joins; one rank
        window per panel replaces the per-call TakeOrdered.
        Row-identical per panel to :meth:`significant_terms`
        (equivalence-tested) — fixed job costs paid once per batch."""
        from .build import _tombstones, index_paths

        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        queries, match = self._panel_match_sets(queries)
        p = index_paths(self.manifest)
        tf = self.spark.read.parquet(
            *[os.path.join(self.index_dir, rel) for rel in p["tf"]]
        ).select("doc_id", "term")
        tombs = _tombstones(self.spark, self.index_dir, self.manifest)
        if tombs is not None:
            tf = tf.join(tombs.select("doc_id"), "doc_id", "left_anti")
        # per-panel query-term exclusion as a broadcast anti-join (the
        # single path's literal isin can't express per-panel lists)
        qterms = self.spark.createDataFrame(
            [(qid, t) for qid, terms in queries for t in terms],
            "qid int, qterm string",
        )
        fg = (
            tf.join(match, "doc_id")
            .groupBy("query_id", "term")
            .agg(F.count(F.lit(1)).alias("fg_df"))
            .filter(F.col("fg_df") >= min_fg_df)
            .join(
                F.broadcast(qterms),
                (F.col("query_id") == F.col("qid")) & (F.col("term") == F.col("qterm")),
                "left_anti",
            )
        )
        if int(self.manifest.get("stale_deltas", 0)) > 0:
            fallback = self.structure.groupBy("term").agg(
                F.sum("n_docs").alias("df_live")
            )
            bg = (
                fg.join(F.broadcast(self.dictionary.select("term", "df")), "term", "left")
                .join(F.broadcast(fallback), "term")
                .withColumn("bg_df", F.coalesce("df", "df_live"))
                .drop("df", "df_live")
            )
        else:
            bg = fg.join(
                F.broadcast(self.dictionary.select("term", F.col("df").alias("bg_df"))),
                "term",
            )
        m_df = match.groupBy("query_id").agg(F.count(F.lit(1)).alias("m_cnt"))
        lift = (F.col("fg_df").cast("double") * F.lit(float(self.n_docs))) / (
            F.col("bg_df").cast("double") * F.col("m_cnt").cast("double")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("lift"), F.desc("fg_df"), F.asc("term")
        )
        return (
            bg.join(F.broadcast(m_df), "query_id")
            .select("query_id", "term", "fg_df", "bg_df", lift.alias("lift"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk")
            .orderBy("query_id", F.desc("lift"), F.desc("fg_df"), F.asc("term"))
        )

    def rank_eval(
        self,
        queries: Sequence[Query],
        qrels: DataFrame,
        strategy: str = "taat",
    ) -> DataFrame:
        """Search-quality evaluation (Elasticsearch ``_rank_eval``):
        serve the query batch, score each ranking against a relevance-
        labels table ``qrels`` (query_id, doc_id) → one row per LABELED
        query: (query_id, n_rel, hits_at_k, precision_at_k,
        recall_at_k, reciprocal_rank), query_id ascending.

        Metrics are the set-based classics whose arithmetic is exact
        in IEEE doubles (single integer divisions — engine-independent
        by construction): P@k = hits/k, R@k = hits/n_rel,
        RR = 1/rank-of-first-relevant (0 when no relevant doc is
        retrieved).  NDCG is deliberately absent: its log2 discounts
        are libm transcendentals that differ across engines — the
        wrong trade for an oracle-checked metric.

        Plan: ONE :meth:`topk_batch` serves every query; the
        (benchmark-sized) qrels broadcast-join the ≤ Σk hit rows;
        per-query metrics are one partial agg.  Queries absent from
        ``qrels`` produce no row (nothing to grade against)."""
        hits = self.topk_batch(queries, strategy=strategy).select(
            "query_id", "doc_id", "rank"
        )
        kdf = self.spark.createDataFrame(
            [(int(q.query_id), int(q.k)) for q in queries], "query_id int, k int"
        )
        qr = qrels.select("query_id", "doc_id").distinct()
        n_rel = qr.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
        relhits = (
            hits.join(F.broadcast(qr), ["query_id", "doc_id"])
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("hits_at_k"),
                F.min("rank").alias("_first"),
            )
        )
        return (
            n_rel.join(relhits, "query_id", "left")
            .join(F.broadcast(kdf), "query_id")
            .select(
                "query_id",
                "n_rel",
                F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
                (
                    F.coalesce("hits_at_k", F.lit(0)).cast("double") / F.col("k")
                ).alias("precision_at_k"),
                (
                    F.coalesce("hits_at_k", F.lit(0)).cast("double") / F.col("n_rel")
                ).alias("recall_at_k"),
                F.coalesce(
                    F.lit(1.0) / F.col("_first").cast("double"), F.lit(0.0)
                ).alias("reciprocal_rank"),
            )
            .orderBy("query_id")
        )

    def simple_query_string(
        self,
        text: str,
        k: int = 10,
        mode: str = "OR",
        strategy: str = "taat",
        max_expansions: int = 32,
        slop: int = 0,
    ) -> DataFrame:
        """User-facing query language (the useful core of
        Elasticsearch ``simple_query_string``), composed from the
        engine's existing primitives — the parser adds NO new
        semantics, only routing:

        - ``\"quoted words\"`` — the whole query is ONE exact phrase
          (ordered adjacency, ``slop``-relaxed) → :meth:`search_phrase`
        - ``-token`` — must_not: matching docs are excluded, surviving
          scores untouched (``Query.exclude``)
        - ``tok*`` / ``t?k`` — wildcard: expanded against the
          dictionary (df-ranked, ``max_expansions``-capped — Lucene's
          top-terms rewrite) into ordinary scored terms
        - anything else — analyzed through the index config and scored

        Every token (including exclusions) runs through the index's own
        analysis, so surface forms hit stemmed indexes correctly.
        Mixing a quoted phrase with other tokens is rejected loudly
        (the scoring semantics would be ambiguous) rather than guessed.
        Text that analyzes to nothing → empty result, like
        :meth:`search`."""
        import shlex

        lex = shlex.shlex(text, posix=False)
        lex.whitespace_split = True
        parts = list(lex)
        phrases = [p for p in parts if p.startswith('"')]
        rest = [p for p in parts if not p.startswith('"')]
        if phrases:
            if rest or len(phrases) > 1:
                raise ValueError(
                    "simple_query_string supports ONE quoted phrase as the whole"
                    " query; mixing phrases with other tokens is ambiguous —"
                    " run them as separate queries"
                )
            return self.search_phrase(phrases[0].strip('"'), k, slop=slop)
        terms: list[str] = []
        exclude: list[str] = []
        for p in rest:
            neg = p.startswith("-")
            body = p[1:] if neg else p
            if not body:
                continue
            if "*" in body or "?" in body:
                expanded = [
                    r["term"]
                    for r in self.expand_wildcard(
                        body.lower(), max_expansions=max_expansions
                    ).collect()
                ]
            else:
                expanded = self.analyze(body)
            (exclude if neg else terms).extend(expanded)
        terms = list(dict.fromkeys(terms))
        # a term both scored and excluded (e.g. "merge -mer*") reaches
        # topk_batch's overlap validation and raises LOUDLY — guessing
        # which side the user meant would silently change the result
        exclude = list(dict.fromkeys(exclude))
        if not terms:
            return self._empty_result().drop("query_id")
        return self.topk_batch(
            [Query(0, terms, mode, k, exclude=tuple(exclude))],
            strategy=strategy,
        ).drop("query_id")

    def did_you_mean(
        self, text: str, max_dist: int = 2
    ) -> tuple[list[str] | None, list[dict]]:
        """Query correction (the Elasticsearch phrase-suggester shape):
        analyze ``text`` through the index's own config, look up each
        analyzed term in the index's term space, and spell-correct the
        UNKNOWN ones via ONE :meth:`suggest_batch` job (length-band
        theta-join against the dictionary — never touches postings).

        Returns ``(corrected_terms, corrections)``: ``corrected_terms``
        is the analyzed token stream with each correctable unknown
        replaced by its best candidate ((dist asc, df desc, term asc)
        — the highest-evidence nearest term), or ``None`` when every
        term already exists or nothing within ``max_dist`` was found;
        ``corrections`` lists {term, replacement, dist, df} per fixed
        token.  The corrected list lives in the index's TERM space
        (stems for a stemmed index), so the retry query is
        ``topk(corrected_terms)`` / ``topk_batch`` — NOT ``search``,
        which would re-analyze and re-stem already-stemmed terms
        (stemmers are not idempotent: porter2("generous") is
        "generou").  During a bounded-staleness window, membership
        includes terms that exist only in un-refreshed delta
        generations (structure-derived, same guard as more_like_this)
        so a valid new term is never "corrected" away.  Driver-side
        cost: O(#query terms) collected rows."""
        toks = self.analyze_ordered(text)
        if not toks:
            return None, []
        uniq = sorted(set(toks))
        terms_src = self.dictionary.select("term")
        if int(self.manifest.get("stale_deltas", 0)) > 0:
            # epoch dictionary lacks delta-only terms; the structure
            # scan is term-pruned by the isin below, so this stays
            # O(asked terms), not O(vocab)
            terms_src = terms_src.union(self.structure.select("term"))
        known = {
            r["term"]
            for r in terms_src.filter(F.col("term").isin(uniq)).distinct().collect()
        }
        unknown = [t for t in uniq if t not in known]
        if not unknown:
            return None, []
        cand = self.suggest_batch(list(enumerate(unknown)), max_dist=max_dist, n=1)
        best = {unknown[r["query_id"]]: r for r in cand.collect()}
        if not best:
            return None, []
        corrected = [best[t]["term"] if t in best else t for t in toks]
        corrections = [
            {
                "term": t,
                "replacement": best[t]["term"],
                "dist": best[t]["dist"],
                "df": best[t]["df"],
            }
            for t in unknown
            if t in best
        ]
        return corrected, corrections

    def facet_counts(self, terms: Sequence[str], facet: str = "topic") -> DataFrame:
        """Facet counts over the OR-match set: how many live docs
        matching ANY of ``terms`` fall in each ``facet`` bucket (a
        docmeta column), ordered (count desc, facet asc) — the
        aggregation panel next to search results.

        Plan: term-pruned posting scan → doc ids decoded per list →
        distinct (match set, ≪ corpus for selective terms) → join
        docmeta (AQE picks broadcast when the match set is small) →
        partial-agg count per facet.  Nothing here is O(corpus) except
        the docmeta side of the join, which prunes to (doc_id, facet)
        columns."""
        return (
            self.facet_counts_batch([(0, list(terms))], facet=facet)
            .drop("query_id")
        )

    def _panel_match_sets(
        self, queries: Sequence[tuple[int, Sequence[str]]]
    ) -> tuple[list[tuple[int, list[str]]], DataFrame]:
        """The shared front half of every facet batch (counts /
        histogram / stats): normalize and validate the (query_id,
        terms) panels, then build the per-(panel, doc) DISTINCT match
        set — ONE term-pruned posting decode for the union of terms +
        a broadcast term→panel fan-out (a term shared by two panels
        fans to both).  Fixing match-set semantics here fixes all
        three aggregations at once."""
        queries = [(int(qid), sorted(set(terms))) for qid, terms in queries]
        _check_unique_qids(qid for qid, _ in queries)
        if not queries or any(not terms for _, terms in queries):
            raise ValueError("every panel needs at least one term")
        all_terms = sorted({t for _, terms in queries for t in terms})
        tq = self.spark.createDataFrame(
            [(qid, t) for qid, terms in queries for t in terms],
            "query_id int, term string",
        )
        match = (
            self.decoded_docs(all_terms)
            .join(F.broadcast(tq), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        return queries, match

    def _panel_scored_aggs(
        self, queries: Sequence[tuple[int, Sequence[str]]], mode: str
    ) -> tuple[list[tuple[int, list[str]]], DataFrame]:
        """The shared SCORED front half of the panel batch rankers
        (field collapse / function score): normalize and validate the
        panels, decode the union of terms once WITH scores, broadcast
        the term→panel fan-out, and aggregate one score sum per
        (panel, doc) — AND panels additionally require the panel's
        full distinct-term count (broadcast per-panel size table).
        The membership-only sibling is :meth:`_panel_match_sets`."""
        if mode not in ("OR", "AND"):
            raise ValueError(f"unknown mode {mode!r}: use 'OR' or 'AND'")
        queries = [(int(qid), sorted(set(terms))) for qid, terms in queries]
        _check_unique_qids(qid for qid, _ in queries)
        if not queries or any(not terms for _, terms in queries):
            raise ValueError("every panel needs at least one term")
        all_terms = sorted({t for _, terms in queries for t in terms})
        tq = self.spark.createDataFrame(
            [(qid, t) for qid, terms in queries for t in terms],
            "query_id int, term string",
        )
        d = (
            self.decoded(all_terms).select("term", "doc_id", "score_q")
            .join(F.broadcast(tq), "term")
        )
        if mode == "AND":
            sizes = self.spark.createDataFrame(
                [(qid, len(terms)) for qid, terms in queries],
                "query_id int, q_n_terms int",
            )
            agg = (
                d.groupBy("query_id", "doc_id")
                .agg(
                    F.sum("score_q").alias("score_q"),
                    F.countDistinct("term").alias("n_terms"),
                )
                .join(F.broadcast(sizes), "query_id")
                .filter(F.col("n_terms") == F.col("q_n_terms"))
                .select("query_id", "doc_id", "score_q")
            )
        else:
            agg = d.groupBy("query_id", "doc_id").agg(
                F.sum("score_q").alias("score_q")
            )
        return queries, agg

    def facet_counts_batch(
        self, queries: Sequence[tuple[int, Sequence[str]]], facet: str = "topic"
    ) -> DataFrame:
        """Facet counts for a batch of (query_id, terms) panels in ONE
        job → (query_id, facet, n_docs).  Plan: the shared
        :meth:`_panel_match_sets` decode (one scan for the union of
        terms, broadcast fan-out, per-(query, doc) distinct), one
        docmeta join, one partial-agg count — the per-panel fixed cost
        (scan + decode + join) is paid once for the whole batch."""
        _, docs = self._panel_match_sets(queries)
        return (
            docs.join(self.docmeta.select("doc_id", facet), "doc_id")
            .groupBy("query_id", facet)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.asc("query_id"), F.desc("n_docs"), F.asc(facet))
        )

    def facet_histogram(
        self,
        terms: Sequence[str],
        col: str = "doc_len",
        edges: Sequence[float] = (0, 100, 200, 400),
    ) -> DataFrame:
        """Range-facet aggregation over the OR-match set (Elasticsearch's
        ``range`` aggregation next to search results): counts of live
        docs matching ANY of ``terms`` per half-open bucket
        ``[edges[i], edges[i+1])`` of a numeric docmeta column →
        (bucket_start, bucket_end, n_docs), bucket-start ascending.
        Values outside ``[edges[0], edges[-1])`` are not counted —
        callers wanting an overflow bucket add a high edge.

        Plan: the same term-pruned decode → distinct match set →
        docmeta join as :meth:`facet_counts`; the bucket index is a
        pure JVM expression (Σ (value >= edge) − 1 over the literal
        edge list — no UDF, no extra shuffle beyond the count agg)."""
        uniq = sorted(set(terms))
        if not uniq:
            raise ValueError("needs at least one term")
        return (
            self.facet_histogram_batch([(0, uniq)], col=col, edges=edges)
            .drop("query_id")
        )

    def facet_histogram_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        col: str = "doc_len",
        edges: Sequence[float] = (0, 100, 200, 400),
    ) -> DataFrame:
        """Range-facet histograms for a batch of (query_id, terms)
        panels in ONE job → (query_id, bucket_start, bucket_end,
        n_docs).  One term-pruned posting scan decoded once for the
        union of terms, a broadcast term→panel fan-out, per-(panel,
        doc) distinct, one docmeta join and one partial-agg count —
        the fixed job cost is paid once per batch instead of once per
        panel (the same shape as :meth:`facet_counts_batch`; the
        bucket index stays a pure JVM expression).  Row-identical per
        panel to :meth:`facet_histogram`, which delegates here."""
        edges = [float(e) for e in edges]
        # `not (a < b)` (rather than `a >= b`) also rejects NaN edges,
        # whose comparisons are all False and would silently produce
        # nonsense buckets
        if len(edges) < 2 or any(
            not math.isfinite(e) for e in edges
        ) or any(not (a < b) for a, b in zip(edges, edges[1:])):
            raise ValueError("edges must be >= 2 finite, strictly increasing values")
        _, match = self._panel_match_sets(queries)
        v = F.col(col).cast("double")
        idx = sum((v >= F.lit(e)).cast("int") for e in edges) - F.lit(1)
        starts = F.array(*[F.lit(e) for e in edges[:-1]])
        ends = F.array(*[F.lit(e) for e in edges[1:]])
        return (
            match.join(self.docmeta.select("doc_id", col), "doc_id")
            .withColumn("bidx", idx)
            .filter((F.col("bidx") >= 0) & (F.col("bidx") < len(edges) - 1))
            .select(
                "query_id",
                F.element_at(starts, F.col("bidx") + 1).alias("bucket_start"),
                F.element_at(ends, F.col("bidx") + 1).alias("bucket_end"),
            )
            .groupBy("query_id", "bucket_start", "bucket_end")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.asc("query_id"), F.asc("bucket_start"))
        )

    def facet_stats(self, terms: Sequence[str], col: str = "doc_len") -> DataFrame:
        """Stats aggregation over the OR-match set (Elasticsearch's
        ``stats`` aggregation next to search results): count / min /
        max / sum / avg / median of a numeric docmeta column over the
        live docs matching ANY of ``terms`` → one row (n_docs, min_v,
        max_v, sum_v, avg_v, median_v).  Same term-pruned decode → distinct match set →
        pruned docmeta join plan as :meth:`facet_counts`; the stats are
        one partial-agg (map-side combine) over the match set.  avg is
        derived sum/count, so for integer-valued columns every output
        is exact and engine-independent."""
        return (
            self.facet_stats_batch([(0, list(terms))], col=col).drop("query_id")
        )

    def facet_stats_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        col: str = "doc_len",
    ) -> DataFrame:
        """Stats aggregations for a batch of (query_id, terms) panels
        in ONE job → (query_id, n_docs, min_v, max_v, sum_v, avg_v,
        median_v).
        One posting scan decoded once for the union of terms, broadcast
        term→panel fan-out, per-(panel, doc) distinct, one docmeta
        join, one partial agg — fixed job costs paid once per batch
        (the :meth:`facet_counts_batch` shape).  Row-identical per
        panel to :meth:`facet_stats`, which delegates here.

        NULL semantics follow the Elasticsearch stats agg: ``n_docs``
        counts matched docs where the field is PRESENT (non-null),
        and every stat — including the avg denominator — runs over
        those same docs, so the outputs stay mutually consistent on
        nullable columns (a panel whose matches all lack the field
        yields no row, like a no-match panel)."""
        _, match = self._panel_match_sets(queries)
        v = F.col(col).cast("double")
        return (
            match.join(self.docmeta.select("doc_id", col), "doc_id")
            .groupBy("query_id")
            .agg(
                F.count(v).alias("n_docs"),
                F.min(v).alias("min_v"),
                F.max(v).alias("max_v"),
                F.sum(v).alias("sum_v"),
                (F.sum(v) / F.count(v)).alias("avg_v"),
                # exact median (interpolated midpoint for even counts
                # — the same linear-interpolation definition DuckDB's
                # median/quantile_cont uses, so integer columns stay
                # engine-identical); percentile_approx would not be
                F.median(v).alias("median_v"),
            )
            .filter(F.col("n_docs") > 0)
            .orderBy("query_id")
        )

    def synonym_topk(
        self, groups: Sequence[Sequence[str]], k: int = 10, mode: str = "OR"
    ) -> DataFrame:
        """Query-time synonym expansion with PROPER group statistics:
        each group of synonyms scores as ONE logical term — group tf =
        Σ member tf per doc, group df = docs containing ANY member —
        so a synonym set is not over-weighted by summing near-duplicate
        idf contributions (the failure mode of naive OR expansion).

        Plan: term-pruned postings decode → broadcast term→group map →
        per-(doc, group) partial agg → group-df agg (O(groups) rows) →
        the shared quantized BM25 kernel → per-doc sum, top-k.  AND
        mode requires every group matched."""
        if mode not in ("OR", "AND"):
            # validate BEFORE the empty-groups early return — a typo'd
            # mode must raise even when the group list filtered empty
            raise ValueError(f"unknown mode {mode!r}: use 'OR' or 'AND'")
        gs = [list(dict.fromkeys(g)) for g in groups if g]
        if not gs:
            return self._empty_result().select("doc_id", "score_q")
        return (
            self.synonym_topk_batch([(0, gs)], k=k, mode=mode)
            .drop("query_id", "rank")
        )

    def synonym_topk_batch(
        self,
        queries: "Sequence[tuple[int, Sequence[Sequence[str]]]]",
        k: int = 10,
        mode: str = "OR",
    ) -> DataFrame:
        """Synonym-expanded top-k for a batch of (query_id, groups)
        panels in ONE job → (query_id, doc_id, score_q, rank), top-k
        per panel.  Each panel's groups keep PROPER group statistics
        (group tf = Σ member tf, group df = docs containing ANY
        member) under a composite "qid:gid" scoring key, so one
        term-pruned decode + one broadcast term→(panel, group) map +
        one partial agg serve every panel; per-panel rank windows
        replace the per-call TakeOrdered.  Row-identical per panel to
        :meth:`synonym_topk`, which delegates here."""
        if mode not in ("OR", "AND"):
            raise ValueError(f"unknown mode {mode!r}: use 'OR' or 'AND'")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        norm: list[tuple[int, list[list[str]]]] = []
        for qid, groups in queries:
            gs = [list(dict.fromkeys(g)) for g in groups if g]
            if not gs:
                raise ValueError(f"panel {qid}: needs at least one non-empty group")
            seen: set[str] = set()
            for g in gs:
                for t in g:
                    if t in seen:
                        raise ValueError(
                            f"panel {qid}: term {t!r} appears in more than one group"
                        )
                    seen.add(t)
            norm.append((int(qid), gs))
        _check_unique_qids(qid for qid, _ in norm)
        from ..operators.scoring import bm25_term_scores
        from .build import _load_cfg

        cfg = _load_cfg(self.manifest, self.index_dir)
        rows = [
            (qid, f"{qid}:{gi}", t)
            for qid, gs in norm
            for gi, g in enumerate(gs)
            for t in g
        ]
        mapping = self.spark.createDataFrame(
            rows, "query_id int, gkey string, term string"
        )
        all_terms = sorted({t for _, _, t in rows})
        gtf = (
            self.decoded(all_terms)
            .join(F.broadcast(mapping), "term")
            .groupBy("doc_id", "gkey")
            .agg(F.sum("tf").alias("tf"))
        )
        gstats = gtf.groupBy("gkey").agg(F.count(F.lit(1)).alias("df"))
        doclens = self.docmeta.select("doc_id", "doc_len")
        scored = bm25_term_scores(
            gtf.withColumnRenamed("gkey", "term"),
            gstats.withColumnRenamed("gkey", "term"),
            doclens, self.n_docs, self.avgdl, k1=cfg.k1, b=cfg.b,
        )
        agg = (
            scored.withColumn(
                "query_id", F.split(F.col("term"), ":").getItem(0).cast("int")
            )
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum("score_q").alias("score_q"),
                F.count(F.lit(1)).alias("_ng"),
            )
        )
        if mode == "AND":
            want = self.spark.createDataFrame(
                [(qid, len(gs)) for qid, gs in norm], "query_id int, _want int"
            )
            agg = (
                agg.join(F.broadcast(want), "query_id")
                .filter(F.col("_ng") == F.col("_want"))
                .drop("_want")
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_q"), F.asc("doc_id")
        )
        return (
            agg.drop("_ng")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("query_id", "rank")
        )

    # ---------- hybrid lexical + dense retrieval ----------

    def hybrid_topk(
        self,
        terms: Sequence[str],
        vecs: DataFrame,
        query_vec: Sequence[float],
        k: int = 10,
        m: int = 50,
        rrf_k: int = 60,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        strategy: str = "taat",
    ) -> DataFrame:
        """Hybrid retrieval with reciprocal-rank fusion: BM25 top-``m``
        candidates from the index, joined to their embeddings and
        re-scored against ``query_vec`` by quantized cosine, fused as
        ``rrf = 1/(rrf_k+rank_bm25) + 1/(rrf_k+rank_cos)`` (the
        standard RRF; rank-based, so no score normalization between
        the lexical and dense spaces is needed), top-``k`` by
        (rrf desc, doc_id asc).

        Scale shape: the candidate set is m-bounded (driver-known
        tiny), so it is BROADCAST against the arbitrarily large
        embedding table — the big side is never shuffled, and column
        pruning keeps only (id, vector).  Cosine uses the same
        floor(x·q·1e9+0.5) integer-quantized kernel as the ANN
        operators (bit-deterministic at any parallelism, oracle-equal
        in SQL), evaluated with zip_with/aggregate — pure JVM, no UDF.
        Candidates with no embedding row keep their lexical rank and
        contribute no dense term (cos is null, ranked last)."""
        from ..operators.similarity import DOT_QUANT

        q = np.asarray(list(query_vec), dtype=np.float64)
        qn2 = int(np.floor(q * q * DOT_QUANT + 0.5).astype(np.int64).sum())
        if qn2 <= 0:
            raise ValueError("query_vec must be non-zero")
        cand = self.topk_batch([Query(0, list(terms), "OR", m)], strategy=strategy).select(
            "doc_id",
            F.col("score_q").alias("bm25_q"),
            F.col("rank").alias("rank_bm25"),
        )
        qarr = F.array(*[F.lit(float(x)) for x in q])
        emb = vecs.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_emb"))
        joined = emb.join(F.broadcast(cand), "doc_id").select(
            "doc_id",
            F.aggregate(
                F.zip_with(
                    F.col("_emb"), qarr,
                    lambda x, y: F.floor(
                        x.cast("double") * y * F.lit(float(DOT_QUANT)) + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dot_q"),
            F.aggregate(
                F.transform(
                    F.col("_emb"),
                    lambda x: F.floor(
                        x.cast("double") * x.cast("double") * F.lit(float(DOT_QUANT)) + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("norm2_q"),
        )
        # nullif: a document embedding that quantizes to zero norm has
        # no dense signal — treat it like a missing embedding row (cos
        # null, ranked last) instead of dividing by zero (ANSI mode
        # would fail the whole job; non-ANSI would emit Infinity and
        # steal rank_cos 1)
        scored = cand.join(joined, "doc_id", "left").withColumn(
            "cos",
            F.floor(
                F.col("dot_q").cast("double")
                / (F.sqrt(F.nullif(F.col("norm2_q"), F.lit(0)).cast("double"))
                   * F.lit(math.sqrt(float(qn2))))
                * F.lit(1e6) + F.lit(0.5)
            ) / F.lit(1e6),
        )
        w = Window.orderBy(F.desc_nulls_last("cos"), F.asc("doc_id"))
        fused = scored.withColumn("rank_cos", F.row_number().over(w)).withColumn(
            "rrf_q",
            F.floor(
                (
                    F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_bm25"))
                    + F.when(F.col("cos").isNull(), F.lit(0.0)).otherwise(
                        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_cos"))
                    )
                ) * F.lit(1e9) + F.lit(0.5)
            ).cast("long"),
        )
        return (
            fused.select("doc_id", "bm25_q", "cos", "rrf_q")
            .orderBy(F.desc("rrf_q"), F.asc("doc_id"))
            .limit(k)
        )

    def hybrid_topk_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str], Sequence[float]]],
        vecs: DataFrame,
        k: int = 10,
        m: int = 50,
        rrf_k: int = 60,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        strategy: str = "taat",
    ) -> DataFrame:
        """Hybrid RRF retrieval for a batch of (query_id, terms,
        query_vec) queries in ONE pipeline → (query_id, doc_id, bm25_q,
        cos, rrf_q) — row-identical per query to :meth:`hybrid_topk`
        (same candidate pool, same quantized-cosine arithmetic, same
        (rrf desc, doc_id asc) cut).

        Plan: ONE :meth:`topk_batch` serves every query's BM25
        top-``m`` pool (the posting artifact is scanned once for the
        union of terms), the pools pick up their query's vector from a
        broadcast (query_id, qvec, qnorm) panel, and the m·|batch|
        labeled candidate set — still driver-known tiny — broadcasts
        against the arbitrarily large embedding table exactly like the
        single-query plan (the dense side is never shuffled; a doc
        candidate for two queries re-scores once per query, as it
        must).  Both rank windows partition by query_id, so per-batch
        fixed costs (two scans, the broadcast, the windows) are paid
        once for the whole batch instead of once per query."""
        from ..operators.similarity import DOT_QUANT

        queries = [
            (int(qid), list(terms), np.asarray(list(qv), dtype=np.float64))
            for qid, terms, qv in queries
        ]
        _check_unique_qids(qid for qid, _, _ in queries)
        qnorm: dict[int, float] = {}
        for qid, _, q in queries:
            qn2 = int(np.floor(q * q * DOT_QUANT + 0.5).astype(np.int64).sum())
            if qn2 <= 0:
                raise ValueError(f"query_vec must be non-zero (query {qid})")
            qnorm[qid] = math.sqrt(float(qn2))
        cand = self.topk_batch(
            [Query(qid, terms, "OR", m) for qid, terms, _ in queries],
            strategy=strategy,
        ).select(
            "query_id",
            "doc_id",
            F.col("score_q").alias("bm25_q"),
            F.col("rank").alias("rank_bm25"),
        )
        panel = self.spark.createDataFrame(
            [(qid, [float(x) for x in q], qnorm[qid]) for qid, _, q in queries],
            "query_id int, qvec array<double>, qnorm double",
        )
        cand_q = cand.join(F.broadcast(panel), "query_id")
        emb = vecs.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_emb"))
        joined = emb.join(
            F.broadcast(cand_q.select("query_id", "doc_id", "qvec")), "doc_id"
        ).select(
            "query_id",
            "doc_id",
            F.aggregate(
                F.zip_with(
                    F.col("_emb"), F.col("qvec"),
                    lambda x, y: F.floor(
                        x.cast("double") * y * F.lit(float(DOT_QUANT)) + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dot_q"),
            F.aggregate(
                F.transform(
                    F.col("_emb"),
                    lambda x: F.floor(
                        x.cast("double") * x.cast("double") * F.lit(float(DOT_QUANT)) + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("norm2_q"),
        )
        # same zero-norm guard as the single-query plan: cos null, not
        # a division failure / an Infinity stealing rank_cos 1
        scored = cand_q.join(joined, ["query_id", "doc_id"], "left").withColumn(
            "cos",
            F.floor(
                F.col("dot_q").cast("double")
                / (F.sqrt(F.nullif(F.col("norm2_q"), F.lit(0)).cast("double"))
                   * F.col("qnorm"))
                * F.lit(1e6) + F.lit(0.5)
            ) / F.lit(1e6),
        )
        w_cos = Window.partitionBy("query_id").orderBy(
            F.desc_nulls_last("cos"), F.asc("doc_id")
        )
        fused = scored.withColumn("rank_cos", F.row_number().over(w_cos)).withColumn(
            "rrf_q",
            F.floor(
                (
                    F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_bm25"))
                    + F.when(F.col("cos").isNull(), F.lit(0.0)).otherwise(
                        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_cos"))
                    )
                ) * F.lit(1e9) + F.lit(0.5)
            ).cast("long"),
        )
        w_k = Window.partitionBy("query_id").orderBy(F.desc("rrf_q"), F.asc("doc_id"))
        return (
            fused.withColumn("rank_k", F.row_number().over(w_k))
            .filter(F.col("rank_k") <= F.lit(k))
            .select("query_id", "doc_id", "bm25_q", "cos", "rrf_q")
            .orderBy("query_id", F.desc("rrf_q"), F.asc("doc_id"))
        )

    # ---------- relational (oracle-checkable) path ----------

    def decoded(self, terms: Sequence[str] | None = None) -> DataFrame:
        """(doc_id, term, tf, score_q) rows decoded from postings."""
        rows = self.postings
        if terms is not None:
            rows = rows.filter(F.col("term").isin(list(terms)))

        def decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdf_iter:
                for r in pdf.to_dict("records"):
                    docs, tfs, scores = codec.decode_all(r)
                    yield pd.DataFrame({
                        "term": r["term"],
                        "doc_id": docs,
                        "tf": tfs,
                        "score_q": scores,
                    })

        return rows.mapInPandas(decode, "term string, doc_id long, tf long, score_q long")

    def decoded_docs(self, terms: Sequence[str] | None = None) -> DataFrame:
        """(term, doc_id) membership-only decode: skips the tf AND
        score varint streams entirely (the codec shortcut the WAND
        must_not masks use) and — in the un-fused state — never touches
        the scores artifact at all: the structure side alone carries
        doc membership.  The facet/histogram/stats match sets only
        need doc ids, and the Python-side varint decode IS the
        kernel's cost, so this is the right scan for them."""
        rows = self.combined if self.combined is not None else self.structure
        if terms is not None:
            rows = rows.filter(F.col("term").isin(list(terms)))
        rows = rows.select(
            "term", "n_docs", "docs_payload", "block_firsts", "block_counts"
        )

        def decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdf_iter:
                for r in pdf.to_dict("records"):
                    yield pd.DataFrame({
                        "term": r["term"],
                        "doc_id": codec.decode_doc_ids(r),
                    })

        return rows.mapInPandas(decode, "term string, doc_id long")

    def topk_relational(
        self, terms: Sequence[str], k: int = 10, mode: str = "OR"
    ) -> DataFrame:
        """Same answer as WAND via plain DataFrame ops (the correctness
        mirror; also the ANSI-SQL-expressible formulation).  Degenerate
        unfiltered case of :meth:`topk_filtered` — one scoring body."""
        return self.topk_filtered(terms, k, mode, "true")

    def topk_filtered(
        self,
        terms: Sequence[str],
        k: int = 10,
        mode: str = "OR",
        predicate: str = "true",
    ) -> DataFrame:
        """Metadata-filtered BM25 top-k: rank only documents whose
        docmeta row satisfies ``predicate`` (any SQL expression over
        docmeta columns — topic, doc_len, the id columns...).

        Physical shape: decode the queried posting lists, LEFT-SEMI
        join the allowed doc ids, aggregate, cut.  The allowed set is
        produced by a pushed-down docmeta scan; at 10^12 docs
        co-locate the semi join by bucketing docmeta on the same
        doc-hash the shards use (filters selective enough to broadcast
        get auto-broadcast by Catalyst).  Scores are the same exact
        quantized impacts the unfiltered paths serve — filtering never
        changes a surviving document's score."""
        agg = self._scored_doc_agg(terms, mode, predicate)
        return (
            agg.orderBy(F.desc("score_q"), F.asc("doc_id"))
            .limit(k)
            .select(
                "doc_id", "score_q",
                (F.col("score_q").cast("double") / F.lit(float(QUANT))).alias("score"),
            )
        )

    def _scored_doc_agg(
        self, terms: Sequence[str], mode: str, predicate: str = "true"
    ) -> DataFrame:
        """The shared relational scoring body: decode the queried
        posting lists, optionally LEFT-SEMI join the docmeta rows
        matching ``predicate``, aggregate per doc → (doc_id, score_q).
        The distinct-term count (and its per-doc tracking hash set) is
        only added when AND mode needs it."""
        if mode not in ("OR", "AND"):
            raise ValueError(f"unknown mode {mode!r}: use 'OR' or 'AND'")
        uniq = sorted(set(terms))
        d = self.decoded(uniq)
        if predicate.strip().lower() != "true":  # unfiltered: skip the semi join
            allowed = self.docmeta.filter(predicate).select("doc_id")
            d = d.join(allowed, "doc_id", "left_semi")
        if mode == "AND":
            return (
                d.groupBy("doc_id")
                .agg(
                    F.sum("score_q").alias("score_q"),
                    F.countDistinct("term").alias("n_terms"),
                )
                .filter(F.col("n_terms") == len(uniq))
                .drop("n_terms")
            )
        return d.groupBy("doc_id").agg(F.sum("score_q").alias("score_q"))

    def function_score_topk(
        self,
        terms: Sequence[str],
        k: int = 10,
        mode: str = "OR",
        factor: str = "doc_len",
    ) -> DataFrame:
        """Function-score ranking (Elasticsearch ``function_score`` with
        ``field_value_factor``, modifier ``none``): final score =
        BM25 score_q × an integer docmeta ``factor`` column →
        (doc_id, score_q, score_fs, rank), top-k by (score_fs desc,
        doc_id asc).

        EXACT over the whole match set by design, not a top-m rescore:
        the factor reorders globally (a low-BM25 doc with a large
        factor can out-rank the lexical top-m), so the pool cut cannot
        be taken before the multiply.  The plan stays O(match set):
        the shared relational scoring body (term-pruned decode → one
        partial agg per doc) joins the factor column pruned out of
        docmeta, multiplies, and cuts with TakeOrderedAndProject.
        Integer × integer keeps every score exact and
        engine-independent (the reason ``factor`` must be integral —
        fractional weighting belongs in Query.boosts or hybrid RRF).
        Delegates to :meth:`function_score_topk_batch` with one panel
        — one code path for the factor semantics."""
        if not list(terms):
            raise ValueError("needs at least one term")
        return (
            self.function_score_topk_batch(
                [(0, list(terms))], k=k, mode=mode, factor=factor
            ).drop("query_id")
        )

    def function_score_topk_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        k: int = 10,
        mode: str = "OR",
        factor: str = "doc_len",
    ) -> DataFrame:
        """Function-score panels for a batch of (query_id, terms) in
        ONE job → (query_id, doc_id, score_q, score_fs, rank), top-k
        per panel by (score_fs desc, doc_id asc).  One term-pruned
        scored decode for the union of terms, a broadcast term→panel
        fan-out, one partial agg per (panel, doc), one pruned docmeta
        join for the factor column, one rank window per panel — the
        :meth:`collapse_topk_batch` shape with the factor multiply in
        place of the field collapse.  ``mode`` applies batch-wide;
        AND panels keep only docs matching every panel term (distinct-
        term count against a broadcast per-panel term count).
        Row-identical per panel to :meth:`function_score_topk`
        (equivalence-tested)."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        _, scored = self._panel_scored_aggs(queries, mode)
        fac = self.docmeta.select(
            "doc_id", F.col(factor).cast("long").alias("_factor")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_fs"), F.asc("doc_id")
        )
        return (
            scored.join(fac, "doc_id")
            .select(
                "query_id",
                "doc_id",
                "score_q",
                (F.col("score_q") * F.col("_factor")).alias("score_fs"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("query_id", "rank")
        )

    def collapse_topk(
        self,
        terms: Sequence[str],
        field: str = "topic",
        k: int = 10,
        mode: str = "OR",
    ) -> DataFrame:
        """Field-collapsed top-k (Elasticsearch's ``collapse``): rank
        the match set by BM25 but keep only the best-scoring doc per
        distinct value of a docmeta ``field``, then cut to the k best
        groups → (field, doc_id, score_q, score) — result diversity
        for serving (one hit per repo, per site, per license...).

        Exact, not per-shard approximate: a field value's docs span
        doc-partitioned shards, so the collapse is a global decision —
        scoring uses the relational body over the term-pruned decode
        (O(match set), same exact quantized impacts the kernels serve).
        Each group's representative is an ASSOCIATIVE min over
        (−score, doc) structs — a two-phase hash aggregation with
        map-side partial combine, so a skewed field value (half the
        corpus in one repo) costs a partial agg, not a single-partition
        window.  Ties: (score desc, doc asc) inside a group and across
        groups."""
        if not set(terms):
            raise ValueError("needs at least one term")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        agg = self._scored_doc_agg(terms, mode)
        best = (
            agg.join(self.docmeta.select("doc_id", field), "doc_id")
            .groupBy(field)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("score_q")).alias("neg_score"),
                        F.col("doc_id").alias("doc_id"),
                    )
                ).alias("best")
            )
        )
        return (
            best.select(
                field,
                F.col("best.doc_id").alias("doc_id"),
                (-F.col("best.neg_score")).alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.asc("doc_id"))
            .limit(k)
            .withColumn(
                "score", F.col("score_q").cast("double") / F.lit(float(QUANT))
            )
        )

    def collapse_topk_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        field: str = "topic",
        k: int = 10,
        mode: str = "OR",
    ) -> DataFrame:
        """Field-collapsed top-k for a batch of (query_id, terms)
        panels in ONE job → (query_id, field, doc_id, score_q, score).
        One term-pruned posting scan decoded once for the union of
        terms, a broadcast term→panel fan-out, per-(panel, doc) score
        aggregation (AND additionally requires the panel's full
        distinct-term count, checked against a broadcast per-panel
        size table), one docmeta join, and the same associative
        min-struct representative pick as :meth:`collapse_topk` —
        still a two-phase hash agg with map-side partial combine, so a
        skewed field value costs a partial agg, not a single-partition
        window.  The only window is the per-panel rank cut to the k
        best groups (partitioned by query_id — bounded by the batch's
        result size, not the corpus).  Row-identical per panel to
        :meth:`collapse_topk` (same (score desc, doc asc) ties)."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        _, agg = self._panel_scored_aggs(queries, mode)
        best = (
            agg.join(self.docmeta.select("doc_id", field), "doc_id")
            .groupBy("query_id", field)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("score_q")).alias("neg_score"),
                        F.col("doc_id").alias("doc_id"),
                    )
                ).alias("best")
            )
            .select(
                "query_id",
                field,
                F.col("best.doc_id").alias("doc_id"),
                (-F.col("best.neg_score")).alias("score_q"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_q"), F.asc("doc_id")
        )
        return (
            best.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(k))
            .drop("rank")
            .withColumn(
                "score", F.col("score_q").cast("double") / F.lit(float(QUANT))
            )
            .orderBy(F.asc("query_id"), F.desc("score_q"), F.asc("doc_id"))
        )

    def bucket_top_hits(
        self,
        terms: Sequence[str],
        field: str = "topic",
        n: int = 3,
        k: int = 10,
        mode: str = "OR",
    ) -> DataFrame:
        """Top-hits-per-bucket aggregation (Elasticsearch ``top_hits``
        inside a terms agg): the generalized-n sibling of
        :meth:`collapse_topk` — for the top-k buckets of a docmeta
        ``field`` (ranked by their best hit, (score desc, doc asc)
        ties like collapse), return each bucket's n best matching docs
        → (query-less) (field, bucket_rank, doc_id, score_q,
        hit_rank).  Delegates to :meth:`bucket_top_hits_batch`."""
        return (
            self.bucket_top_hits_batch([(0, list(terms))], field=field, n=n,
                                       k=k, mode=mode)
            .drop("query_id")
        )

    def bucket_top_hits_batch(
        self,
        queries: Sequence[tuple[int, Sequence[str]]],
        field: str = "topic",
        n: int = 3,
        k: int = 10,
        mode: str = "OR",
    ) -> DataFrame:
        """Top-hits-per-bucket panels for a batch of (query_id, terms)
        in ONE job → (query_id, field, bucket_rank, doc_id, score_q,
        hit_rank): the top-k buckets per panel (ranked by their best
        hit), each carrying its n best docs.  The shared
        :meth:`_panel_scored_aggs` front half scores every panel once;
        one pruned docmeta join attaches the bucket field; a
        per-(panel, bucket) rank window cuts to n hits and a
        per-panel window ranks buckets by their representative.

        Skew note: unlike the 1-per-bucket collapse (which uses an
        associative min-struct to stay window-free), n-per-bucket
        inherently needs per-bucket ORDER — the window partitions by
        (panel, bucket) over the MATCH SET, so a hot bucket serializes
        only its own matching rows, never the corpus."""
        if n < 1 or k < 1:
            raise ValueError(f"n and k must be >= 1, got n={n} k={k}")
        _, agg = self._panel_scored_aggs(queries, mode)
        j = agg.join(self.docmeta.select("doc_id", field), "doc_id")
        wh = Window.partitionBy("query_id", field).orderBy(
            F.desc("score_q"), F.asc("doc_id")
        )
        hits = (
            j.withColumn("hit_rank", F.row_number().over(wh))
            .filter(F.col("hit_rank") <= n)
        )
        wb = Window.partitionBy("query_id").orderBy(
            F.desc("rep_score"), F.asc("rep_doc")
        )
        buckets = (
            hits.filter(F.col("hit_rank") == 1)
            .select(
                "query_id", field,
                F.col("score_q").alias("rep_score"),
                F.col("doc_id").alias("rep_doc"),
            )
            .withColumn("bucket_rank", F.row_number().over(wb))
            .filter(F.col("bucket_rank") <= k)
            .select("query_id", field, "bucket_rank")
        )
        return (
            hits.join(buckets, ["query_id", field])
            .select(
                "query_id", field, "bucket_rank", "doc_id", "score_q", "hit_rank"
            )
            .orderBy("query_id", "bucket_rank", "hit_rank")
        )

    def tfidf_scores(self, terms: Sequence[str] | None = None) -> DataFrame:
        """Degenerate TF-IDF mode: reference formula (tfidf.go:100-103)
        over decoded postings — reproduces wikitfidf rankings.

        During a bounded-staleness window (deferred-refresh deltas
        outstanding) the epoch dictionary lacks terms that exist only
        in the un-refreshed delta; an inner join would silently DROP
        their postings, breaking the stale-mode contract ("doc sets
        exact, scores epoch-stale").  The left join + structure-derived
        fallback df (each term's live posting count, exact by
        construction) keeps every decoded row scored; after
        refresh_scores both sides agree and the fallback is inert."""
        d = self.decoded(terms)
        # exact live df from the structure SIDECAR columns (sum of each
        # list's n_docs) — column pruning keeps the payloads unread, so
        # this costs a narrow scan, not a second decode pass
        struct = self.structure
        if terms is not None:
            struct = struct.filter(F.col("term").isin(list(terms)))
        fallback_df = struct.groupBy("term").agg(F.sum("n_docs").alias("df_live"))
        joined = (
            d.join(F.broadcast(self.dictionary.select("term", "df")), "term", "left")
            .join(F.broadcast(fallback_df), "term")
            .withColumn("df", F.coalesce("df", "df_live"))
            .join(self.docmeta.select("doc_id", "doc_len"), "doc_id")
        )
        raw = (F.col("tf").cast("double") / F.col("doc_len").cast("double")) * F.log10(
            F.lit(float(self.n_docs)) / F.col("df").cast("double")
        )
        return joined.select("doc_id", "term", "tf", round_half_up(raw, 4).alias("tfidf"))

    def explain(self, terms: Sequence[str], doc_ids: Sequence[int]) -> DataFrame:
        """Per-(doc, term) BM25 score breakdown for specific documents —
        Lucene's ``Explanation`` analogue for search-quality debugging:
        (doc_id, term, tf, df, doc_len, idf, score, score_q), where
        ``score_q`` is EXACTLY the stored quantized impact the serving
        paths sum and ``idf``/``score`` are its float preimage
        recomputed from the index's own k1/b and the manifest's
        n/avgdl (during a bounded-staleness window the recomputed
        float uses live df while ``score_q`` stays epoch-stale — the
        gap IS the staleness, made visible).  Plan: term-pruned
        posting decode (``isin`` pushes
        into both parquet scan halves), the bounded doc filter applied
        right after decode, then broadcast joins against the O(|terms|)
        dictionary subset and the asked docs' docmeta rows — O(df of
        the asked terms), never O(corpus)."""
        from .build import _load_cfg

        if not terms:
            raise ValueError("needs at least one term")
        if not doc_ids:
            raise ValueError("needs at least one doc id")
        cfg = _load_cfg(self.manifest, self.index_dir)
        uniq = sorted(set(terms))
        ids = sorted({int(x) for x in doc_ids})
        d = self.decoded(uniq).filter(F.col("doc_id").isin(ids))
        # df and idf ride as literal maps (≤ |terms| driver rows): idf
        # is computed with the SAME math.log + association the build
        # kernel used, so the float preimage is bit-reproducible — a
        # JVM-side F.log / different operation order can land 1 ulp off
        # and break floor(score*QUANT+0.5) == score_q at boundaries.
        # Stale-window guard as in tfidf_scores: delta-only terms miss
        # the epoch dictionary — fall back to the exact live df from
        # the structure sidecar columns.
        live = {
            r["term"]: int(r["df_live"])
            for r in self.structure.filter(F.col("term").isin(uniq))
            .groupBy("term").agg(F.sum("n_docs").alias("df_live")).collect()
        }
        epoch = {
            r["term"]: int(r["df"])
            for r in self.dictionary.select("term", "df")
            .filter(F.col("term").isin(uniq)).collect()
        }
        df_map = {t: epoch.get(t, n) for t, n in live.items()}
        if not df_map:
            return self.spark.createDataFrame(
                [], "doc_id long, term string, tf long, df long, doc_len long,"
                " idf double, score double, score_q long"
            )
        n_f = float(self.n_docs)
        idf_map = {
            t: math.log(1.0 + (n_f - df + 0.5) / (df + 0.5))
            for t, df in df_map.items()
        }
        df_col = F.create_map(
            *[F.lit(x) for t, v in sorted(df_map.items()) for x in (t, v)]
        )[F.col("term")]
        idf_col = F.create_map(
            *[F.lit(x) for t, v in sorted(idf_map.items()) for x in (t, v)]
        )[F.col("term")]
        meta = self.docmeta.select("doc_id", "doc_len").filter(F.col("doc_id").isin(ids))
        # association mirrors the build kernel exactly:
        # idf * (tf * (k1+1)) / (tf + k1 * (1-b + b * (doc_len/avgdl)))
        tf_d = F.col("tf").cast("double")
        denom = tf_d + F.lit(float(cfg.k1)) * (
            F.lit(1.0 - cfg.b)
            + F.lit(float(cfg.b)) * (F.col("doc_len").cast("double") / F.lit(float(self.avgdl)))
        )
        score = (F.col("idf") * (tf_d * F.lit(float(cfg.k1) + 1.0))) / denom
        return (
            d.join(F.broadcast(meta), "doc_id")
            .withColumn("df", df_col)
            .withColumn("idf", idf_col)
            .select(
                "doc_id", "term", "tf", "df", "doc_len",
                "idf", score.alias("score"), "score_q",
            )
            .orderBy(F.asc("doc_id"), F.desc("score_q"), F.asc("term"))
        )

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "query_id int, doc_id long, score_q long, score double, rank int"
        )
