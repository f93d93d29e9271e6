"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from rstreams_spark.session import get_spark

    names = sys.argv[2:] or list(e.queries())
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for tname in TABLES:
        # partial corpora (e.g. the documents-only sf30 tiling) are
        # fine — only the views a named query actually reads matter
        if os.path.isfile(f"{sf_dir}/{tname}.parquet"):
            con.sql(
                f"create view {tname} as select * from '{sf_dir}/{tname}.parquet'"
            )

    from cc_oracle import ITERATIVE_CC_NAMES, run_iterative

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  ~ {name}: rows-only ({len(sdf)} rows)")
                continue
            if name in ITERATIVE_CC_NAMES:
                # bounded-memory twin of the recursive-CTE oracle
                # (>44 GB at sf1); equality vs the CTE is pinned by
                # tests/test_cc_oracle.py at sf0.01/sf0.1
                odf = run_iterative(con, name)
            else:
                odf = con.sql(oracles[name]).df()
            if sorted(sdf.columns) != sorted(odf.columns):
                print(f"  ✗ {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
                failures += 1
                continue
            if len(sdf) != len(odf):
                print(f"  ✗ {name}: rows {len(sdf)} vs {len(odf)}")
                failures += 1
                continue
            a, b = canon(sdf), canon(odf)
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if diff[c].any()]
                print(f"  ✗ {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = diff[c].idxmax()
                    print(f"      {c}[{idx}]: spark={a[c][idx]!r} oracle={b[c][idx]!r}")
                failures += 1
                continue
            print(f"  ✓ {name}: {len(sdf)} rows")
        except Exception as ex:
            print(f"  ✗ {name}: EXCEPTION {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
    print(f"{'FAIL' if failures else 'PASS'}: {len(names) - failures}/{len(names)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
