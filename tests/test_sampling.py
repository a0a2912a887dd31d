"""Deterministic dataset splitting / stratified sampling
(operators/sampling.py): disjoint+complete assignment, proportion
bounds, seed determinism, and the stability-under-growth property that
keeps holdout sets contamination-free across dataset versions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitfidf_spark.operators import sampling

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id").cache()


def test_split_disjoint_complete_and_proportions(spark, ids):
    out = sampling.split_assign(ids, WEIGHTS, seed=7)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000          # complete, one label per row
    assert set(counts) == set(WEIGHTS)
    # binomial tolerance at n=2000: ~4 sigma
    assert abs(counts["train"] - 1600) < 80
    assert abs(counts["val"] - 200) < 60
    assert abs(counts["test"] - 200) < 60


def test_split_deterministic_and_seed_sensitive(spark, ids):
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(ids, WEIGHTS, seed=7).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_assign(ids, WEIGHTS, seed=7).collect()}
    assert a == b
    c = {r["doc_id"]: r["split"] for r in sampling.split_assign(ids, WEIGHTS, seed=8).collect()}
    assert a != c  # a different seed reshuffles assignments


def test_split_stable_under_growth(spark, ids):
    """Adding rows never moves an existing row's split — the
    contamination-freedom property."""
    small = ids.filter(F.col("doc_id") < 500)
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(small, WEIGHTS, seed=7).collect()}
    full = {r["doc_id"]: r["split"] for r in sampling.split_assign(ids, WEIGHTS, seed=7).collect()}
    assert all(full[k] == v for k, v in a.items())


def test_split_weight_validation(spark, ids):
    with pytest.raises(ValueError, match="at least one"):
        sampling.split_assign(ids, {})
    with pytest.raises(ValueError, match="non-negative"):
        sampling.split_assign(ids, {"a": -1.0, "b": 2.0})


def test_stratified_rates_and_optin(spark, ids):
    strat = ids.withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zh"))
    out = sampling.stratified_sample(
        strat, {"en": 0.5}, strata_col="lang", seed=7
    )
    rows = out.collect()
    assert all(r["lang"] == "en" for r in rows)  # zh absent from the map -> 0.0
    assert abs(len(rows) - 500) < 60             # ~50% of the 1000 en rows
    # global-fraction form samples every stratum
    g = sampling.stratified_sample(strat, 0.25, strata_col="lang", seed=7)
    assert {r["lang"] for r in g.collect()} == {"en", "zh"}
    with pytest.raises(ValueError, match="outside"):
        sampling.stratified_sample(strat, 1.5)


def test_sampling_plan_is_scan_level(spark, ids):
    """No shuffle, no UDF: the whole assignment is a codegen projection
    and the sample's threshold is a Filter directly over the scan."""
    plan = sampling.split_assign(ids, WEIGHTS, seed=7)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    plan2 = sampling.stratified_sample(
        ids.withColumn("lang", F.lit("en")), {"en": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2 and "BatchEvalPython" not in plan2


def test_unit_hash_null_keys_and_delimiters_do_not_collide(spark):
    """Keys are md5-hashed per column before joining: NULLs become an
    explicit sentinel (concat_ws would silently drop them, colliding
    (NULL,'x') with ('x',NULL)) and embedded delimiters can't shift
    between columns (('a|b',c) vs ('a','b|c'))."""
    df = spark.createDataFrame(
        [(1, None, "x"), (2, "x", None), (3, "a|b", "c"), (4, "a", "b|c")],
        "rid long, k1 string, k2 string",
    )
    vals = [
        r["u"]
        for r in df.select(
            sampling.unit_hash(["k1", "k2"], seed=3).alias("u")
        ).collect()
    ]
    assert len(set(vals)) == 4
