"""The driver's correctness gate, replicated for the FOLDED queries.

The driver verifies only the first 50 registered ``queries()`` entries,
so near-duplicate variants live in ``folded_queries()`` and are checked
HERE with the identical compare (row count + column names +
order-insensitive value hash vs the DuckDB oracle) at sf0.001.  Folding
criteria are documented on ``__spark_entry__.FOLDED_QUERIES``; this test
keeps the folded surface at full oracle rigor instead of pytest-only
spot checks.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason=f"driver testdata not present at {SF_DIR}",
)


def _norm_cell(v):
    if isinstance(v, (float, np.floating)):
        return f"{float(v):.10g}"
    return str(v)


def _frame_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = ["\x1f".join(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def test_fold_sets_are_consistent():
    """Every folded name exists, the two dicts partition the full
    surface, and the driver-checked window stays within 50 entries."""
    all_q = entry._all_queries()
    checked, folded = entry.queries(), entry.folded_queries()
    assert set(checked) | set(folded) == set(all_q)
    assert not (set(checked) & set(folded))
    assert entry.FOLDED_QUERIES <= set(all_q)
    assert len(checked) <= 50, "driver verifies only the first 50 entries"
    assert set(entry.oracle_sql()) == set(checked)
    assert set(entry.folded_oracle_sql()) == set(folded)


@pytest.mark.parametrize("name", sorted(entry.FOLDED_QUERIES))
def test_folded_query_matches_oracle(spark, duck, name):
    fn = entry.folded_queries()[name]
    sql = entry.folded_oracle_sql()[name]
    spdf = fn(spark, SF_DIR).toPandas()
    opdf = duck.execute(sql).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns), name
    assert len(spdf) == len(opdf), name
    assert _frame_hash(spdf) == _frame_hash(opdf), name
