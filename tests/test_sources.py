"""Source-format switch (wikitfidf_spark/sources.py): the Iceberg-shaped
input abstraction must route reads by config without touching query
code.  The sandbox has no Iceberg catalog jars, so the catalog code
path is exercised via the ``table`` format (same ``spark.table``
resolution Iceberg identifiers go through)."""

from __future__ import annotations

import os

import pytest

from wikitfidf_spark import sources


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv(sources.ENV_FORMAT, raising=False)


def test_default_is_parquet():
    assert sources.source_format() == "parquet"


def test_env_sets_format(monkeypatch):
    monkeypatch.setenv(sources.ENV_FORMAT, "iceberg")
    assert sources.source_format() == "iceberg"


def test_explicit_arg_beats_env(monkeypatch):
    monkeypatch.setenv(sources.ENV_FORMAT, "iceberg")
    assert sources.source_format("json") == "json"


def test_read_named_table_parquet_layout(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    df.write.parquet(os.path.join(str(tmp_path), "docs.parquet"))
    got = sources.read_named_table(spark, str(tmp_path), "docs")
    assert [(r["id"], r["s"]) for r in got.collect()] == [(1, "a")]


def test_read_named_table_routes_other_path_formats(spark, tmp_path, monkeypatch):
    df = spark.createDataFrame([(2, "b")], "id long, s string")
    df.write.json(os.path.join(str(tmp_path), "docs.json"))
    monkeypatch.setenv(sources.ENV_FORMAT, "json")
    got = sources.read_named_table(spark, str(tmp_path), "docs")
    assert [(r["id"], r["s"]) for r in got.select("id", "s").collect()] == [(2, "b")]


def test_catalog_format_resolves_table_identifier(spark, monkeypatch):
    spark.createDataFrame([(3, "c")], "id long, s string").createOrReplaceTempView(
        "src_docs_view"
    )
    monkeypatch.setenv(sources.ENV_FORMAT, "table")
    got = sources.read_named_table(spark, "", "src_docs_view")
    assert [(r["id"], r["s"]) for r in got.collect()] == [(3, "c")]


def test_entry_scans_go_through_the_switch(spark, monkeypatch):
    """_t must honor the format switch: with a bogus format every driver
    query would fail to read, proving there is no hardcoded
    spark.read.parquet left on the scan path."""
    import __spark_entry__ as entry

    monkeypatch.setenv(sources.ENV_FORMAT, "no-such-format")
    with pytest.raises(Exception):
        entry.queries()["semi_filter"](spark, "/root/testdata/sf0.001").collect()
