#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every SQL in <verifyOutDir>/oracle_sql.json, and compares against the
Spark result parquet in <verifyOutDir>/<query>/ — row count, column names
(sorted), and cell values (sorted by all columns, floats rounded).

This is a dev tool only (driver-side python is available in the container);
it is NOT part of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(9)
        # normalize timestamps: unify unit to ns before int64 (datetime64[us]
        # and [ns] produce different int64 magnitudes otherwise)
        if "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.floor("us") \
                .astype("datetime64[ns]").astype("int64")
        # python date objects (Spark DATE -> pandas object col) -> iso str
        elif df[c].dtype == "object" and len(df) and \
                isinstance(df[c].dropna().iloc[0] if df[c].notna().any() else None,
                           __import__("datetime").date):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark result: {e}")
            n_fail += 1
            continue
        o, s = canon(oracle), canon(spark)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(o, s, check_dtype=False,
                                          check_exact=False, rtol=1e-6)
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
