"""Input-source abstraction: the one reader every engine scan goes
through.

The north-rule input is an Iceberg table of source-code repositories
with columns (repo, path, commit, lang, content) — BASELINE.json
``input_hint``; the reference's analogue is the S1 dump-source switch
(wikitfidf.go:28).  The sandbox has no Iceberg catalog jars, so the
in-repo default is the driver's parquet files; on a catalog-equipped
cluster the switch is **config, not code**:

    export SPARK_GRAFT_SOURCE_FORMAT=iceberg
    spark-submit --py-files engine.zip \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=... job.py

and every query reads ``lake.db.<table>`` identifiers unchanged.
Reading through ``spark.table`` (not a path load) preserves Iceberg's
hidden partitioning, partition pruning, and snapshot/time-travel reads
— Catalyst sees the same relation either way, so all downstream
pushdown/pruning assertions (tests/test_plans.py) hold for both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ENV_FORMAT = "SPARK_GRAFT_SOURCE_FORMAT"
#: formats resolved through the session catalog as table identifiers
#: rather than filesystem paths
TABLE_FORMATS = frozenset({"iceberg", "table"})
DEFAULT_FORMAT = "parquet"


def source_format(fmt: str | None = None) -> str:
    """Effective source format: explicit arg > env > parquet."""
    return (fmt or os.environ.get(ENV_FORMAT) or DEFAULT_FORMAT).lower()


def read_source(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read one input table.

    - path formats (``parquet`` default; any DataSource short name —
      ``json``, ``orc``, ``csv`` — works the same way): ``location`` is
      a file or directory path.
    - catalog formats (``iceberg``, ``table``): ``location`` is a
      (possibly catalog-qualified) table identifier resolved by
      ``spark.table`` through the configured catalog.
    """
    f = source_format(fmt)
    if f in TABLE_FORMATS:
        return spark.table(location)
    return spark.read.format(f).load(location)


def read_named_table(
    spark: SparkSession, base: str, name: str, fmt: str | None = None
) -> DataFrame:
    """Read logical table ``name`` under ``base`` using the configured
    format's naming convention: ``<base>/<name>.<fmt>`` for path
    formats (the driver's testdata layout), ``<base>.<name>`` for
    catalog formats (``base`` = ``catalog.namespace``; empty base means
    ``name`` is already fully qualified)."""
    f = source_format(fmt)
    if f in TABLE_FORMATS:
        return read_source(spark, f"{base}.{name}" if base else name, f)
    return read_source(spark, os.path.join(base, f"{name}.{f}"), f)
