#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet output
against the DuckDB oracle SQL and compare (sorted-column, value-level).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = norm(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            duck_df = norm(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL  {name}: columns {list(spark_df.columns)} "
                  f"vs {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL  {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                spark_df, duck_df, check_dtype=False, check_exact=False,
                rtol=1e-6, atol=1e-9)
            print(f"ok    {name} ({len(spark_df)} rows)")
        except AssertionError as e:
            print(f"FAIL  {name}: {str(e).splitlines()[-1]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
