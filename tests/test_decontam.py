"""Eval-set decontamination (operators/decontam.py).

The operator family the training-data pipeline runs pre-training: flag
or drop train docs sharing long n-grams with a held-out eval set.  The
driver-checked oracle row is ``decontaminate`` (__spark_entry__); these
tests pin the semantics the oracle can't see: short-doc immunity,
planted-leak detection, pass-through byte identity, and the policy
threshold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitfidf_spark.operators import decontam


@pytest.fixture(scope="module")
def tables(spark):
    train = spark.createDataFrame(
        [
            # doc 1 contains eval doc 100's exact 5-gram run
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # doc 2 shares vocabulary but no 5-token window ("xixi"
            # survives the >=3-char token grammar and breaks the run)
            (2, "alpha beta gamma xixi delta epsilon zeta omega"),
            # doc 3 too short to carry any 5-gram
            (3, "alpha beta gamma delta"),
            # doc 4 disjoint
            (4, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon zeta suffix")],
        "doc_id long, text string",
    )
    return train, evalset


def test_report_flags_planted_leak_only(tables):
    train, evalset = tables
    rep = {
        r["doc_id"]: r
        for r in decontam.contamination_report(train, evalset, n=5).collect()
    }
    assert set(rep) == {1}
    # doc 1 has 4 distinct 5-grams, of which 2 appear in the eval doc:
    # 'alpha..epsilon' and 'beta..zeta'
    assert rep[1]["n_grams"] == 4
    assert rep[1]["n_hit_grams"] == 2
    assert rep[1]["hit_frac"] == pytest.approx(0.5)


def test_short_docs_are_immune(tables):
    train, evalset = tables
    grams = decontam.ngram_sets(train, n=5)
    assert grams.filter(F.col("doc_id") == 3).count() == 0
    rep = decontam.contamination_report(train, evalset, n=5)
    assert rep.filter(F.col("doc_id") == 3).count() == 0


def test_decontaminate_drops_flagged_and_preserves_bytes(tables):
    train, evalset = tables
    out = decontam.decontaminate(train, evalset, n=5)
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(kept) == {2, 3, 4}
    orig = {r["doc_id"]: r["text"] for r in train.collect()}
    for d, t in kept.items():
        assert t == orig[d]  # anti-join passes content through untouched


def test_threshold_policy(tables):
    train, evalset = tables
    # doc 1's hit_frac is 0.5 — a lenient 0.5 ceiling keeps it
    out = decontam.decontaminate(train, evalset, n=5, max_hit_frac=0.5)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 4}


def test_ngram_sets_guard():
    with pytest.raises(ValueError, match="n must be"):
        decontam.ngram_sets(None, n=0)


def test_dup_span_report_flags_shared_run(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),       # shares run with 2
            (2, "prefix alpha beta gamma delta epsilon tail"),
            (3, "one two three four five six seven"),          # unique
        ],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r for r in decontam.dup_span_report(docs, n=5).collect()}
    assert set(rep) == {1, 2}
    # the shared 5-gram 'alpha beta gamma delta epsilon' is the only dup
    assert rep[1]["n_dup_grams"] == 1 and rep[1]["n_grams"] == 2
    assert rep[2]["n_dup_grams"] == 1 and rep[2]["n_grams"] == 3
    assert rep[1]["dup_frac"] == pytest.approx(0.5)
    with pytest.raises(ValueError, match="min_docs"):
        decontam.dup_span_report(docs, min_docs=1)


def test_dup_span_plan_joins_on_gram_key(tables):
    """The duplicated-gram join must be a keyed join (shuffle or
    broadcast hash on the md5 gram), never a cartesian/nested-loop."""
    train, _ = tables
    plan = (
        decontam.dup_span_report(train)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eval_join_is_broadcast(tables):
    """The corpus side must never shuffle for the eval join: the plan
    carries a broadcast hash join on the md5 gram key."""
    train, evalset = tables
    plan = decontam.contamination_report(train, evalset)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
