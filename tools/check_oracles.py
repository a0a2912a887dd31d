"""Dev harness emulating the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count + column names + order-insensitive value
hash.  Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import numpy as np

    if isinstance(v, (float, np.floating)):  # np.float32 is not a float
        return f"{float(v):.10g}"
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = ["\x1f".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from wikitfidf_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # the dev harness checks the FULL surface: driver-window entries
    # plus the pytest-folded near-duplicates (FOLDED_QUERIES)
    qs, oracles = entry._all_queries(), entry._all_oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        probs = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            probs.append(f"cols spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}")
        if len(spdf) != len(opdf):
            probs.append(f"rows spark={len(spdf)} oracle={len(opdf)}")
        if not probs and frame_hash(spdf) != frame_hash(opdf):
            probs.append("value-hash mismatch")
            merged = spdf.sort_values(sorted(spdf.columns)).reset_index(drop=True).compare(
                opdf[spdf.columns].sort_values(sorted(spdf.columns)).reset_index(drop=True)
            )  # row counts already equal here (checked above)
            if len(merged):
                probs.append(f"first diffs:\n{merged.head(5)}")
        if probs:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(probs))
        else:
            print(f"ok    {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
