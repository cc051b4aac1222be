#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark). Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]
Compares each <verifyOutDir>/<name> parquet (Spark result) against the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json run in DuckDB
over the same tables: row count, column names/dtypes, and values (floats
rounded to 6 decimals), mirroring FIXTURES.md §2.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        # normalize timestamp dtypes to us for comparison
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    # sort rows by all columns: the Spark side is read via a '*.parquet' glob
    # whose concatenation order need not reproduce the query's ORDER BY
    # (multi-file outputs), and the driver's own compare hashes sorted values
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark_df = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            failures += 1
            continue
        dtype_mismatch = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                          for c in spark_df.columns
                          if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                          check_exact=False, rtol=0, atol=5e-7)
            note = f" (dtype diff: {dtype_mismatch})" if dtype_mismatch else ""
            print(f"ok   {name}: {len(spark_df)} rows{note}")
        except AssertionError as e:
            first_line = str(e).splitlines()[0:6]
            print(f"FAIL {name}: values differ: {first_line}")
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
