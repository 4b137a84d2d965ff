"""Local stand-in for the driver's correctness gate: runs every
queries() entry at a given sf_dir, compares against oracle_sql() in DuckDB
(row count + schema column names + order-insensitive value comparison).

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from rabbit_index_ingest_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracle-side artifacts (s3 IVF codebook) must come from the same sf
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} DUCKDB ERROR: {type(e).__name__}: {str(e)[:200]}")
            continue
        g, x = normalize(got), normalize(exp)
        ok_cols = list(g.columns) == list(x.columns)
        ok_rows = len(g) == len(x)
        ok_vals = ok_cols and ok_rows and g.equals(x)
        status = "OK" if ok_vals else "MISMATCH"
        print(f"{name:24s} {status}  rows={len(g)}/{len(x)} cols={list(g.columns) if not ok_cols else 'match'}")
        if not ok_vals:
            failures.append(name)
            if ok_cols and ok_rows:
                neq = (g.ne(x)).any(axis=1)
                print(f"  {int(neq.sum())} differing rows; first diffs:")
                print("  spark:", g[neq].head(3).to_dict("records"))
                print("  duck :", x[neq].head(3).to_dict("records"))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
