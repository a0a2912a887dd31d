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


# ---------------------------------------------------------------- iceberg
# Real-catalog integration: gated on an iceberg-spark-runtime jar being
# present (absent in this sandbox; drop one into $SPARK_HOME/jars — or
# pass --packages — on a catalog-equipped cluster and this test runs).
# Fetch attempted 2026-08-18: repo1.maven.org does not resolve from the
# sandbox (no outbound DNS), so the gate stays — see README "Iceberg".
# It executes in a SUBPROCESS spark-submit because Iceberg's SQL
# extensions + catalog must be set at session construction, which the
# shared session fixture cannot do.

def _iceberg_runtime_jar() -> str | None:
    import glob

    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    jars = glob.glob(os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar"))
    return jars[0] if jars else None


_ICEBERG_JOB = r"""
import os, sys
sys.path.insert(0, os.environ["WTF_REPO"])
from pyspark.sql import SparkSession
from wikitfidf_spark import sources

spark = SparkSession.builder.getOrCreate()
wh = os.environ["WTF_WAREHOUSE"]

spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
spark.sql("DROP TABLE IF EXISTS lake.db.documents")
spark.sql(
    "CREATE TABLE lake.db.documents "
    "(repo string, path string, commit string, lang string, content string) "
    "USING iceberg PARTITIONED BY (bucket(4, repo))"  # hidden partitioning
)
spark.sql(
    "INSERT INTO lake.db.documents VALUES "
    "('r1','a.py','c1','en','alpha one'), ('r2','b.py','c2','en','beta two')"
)
snap1 = spark.sql(
    "SELECT snapshot_id FROM lake.db.documents.snapshots ORDER BY committed_at DESC LIMIT 1"
).collect()[0][0]
spark.sql("INSERT INTO lake.db.documents VALUES ('r3','c.py','c3','zh','gamma three')")

# the engine's switch: identical query code reads the catalog table
os.environ[sources.ENV_FORMAT] = "iceberg"
got = sources.read_named_table(spark, "lake.db", "documents")
assert got.count() == 3, got.count()
assert set(got.columns) >= {"repo", "path", "commit", "lang", "content"}

# snapshot time travel through the same catalog relation
tt = spark.read.option("snapshot-id", snap1).table("lake.db.documents")
assert tt.count() == 2, tt.count()

# partition pruning on the hidden bucket: plan must not list all files
# blindly (smoke: a filter executes and returns the right rows)
assert got.filter(got.repo == "r3").count() == 1
print("ICEBERG_OK")
"""


@pytest.mark.skipif(
    _iceberg_runtime_jar() is None,
    reason="no iceberg-spark-runtime jar under $SPARK_HOME/jars "
    "(sandbox has no catalog; runs as-is on an Iceberg-equipped cluster)",
)
def test_iceberg_catalog_roundtrip_and_time_travel(tmp_path):
    """End-to-end against a REAL Iceberg catalog (hadoop warehouse):
    create a partitioned table of the input_hint shape, read it through
    sources.read_named_table with SPARK_GRAFT_SOURCE_FORMAT=iceberg,
    and verify snapshot time travel — the claims sources.py documents."""
    import subprocess
    import sys as _sys
    import textwrap

    job = tmp_path / "iceberg_job.py"
    job.write_text(textwrap.dedent(_ICEBERG_JOB))
    wh = str(tmp_path / "warehouse")
    env = {
        **os.environ,
        "WTF_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "WTF_WAREHOUSE": wh,
    }
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", "spark.sql.extensions="
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            "--conf", "spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog",
            "--conf", "spark.sql.catalog.lake.type=hadoop",
            "--conf", f"spark.sql.catalog.lake.warehouse={wh}",
            str(job),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG_OK" in out.stdout
