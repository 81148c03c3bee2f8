#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every SQL in <verifyOutDir>/oracle_sql.json, and compares against the
Spark result parquet in <verifyOutDir>/<query>/ — row count, column names
(sorted), and cell values (sorted by all columns).

The comparison is deliberately dtype-strict, mirroring the driver's
value-hash gate: an integer column on one side and a float column on the
other is a FAIL even when the values are numerically equal (the driver
hashes 22 and 22.0 differently — this is exactly how a DuckDB HUGEINT
window sum slipped past the old check_dtype=False comparison in round 4
while the driver scored it red). Integer / string / bool / date columns
are compared exactly; a small rtol applies only to columns that are
genuinely float on BOTH sides.

This is a dev tool only (driver-side python is available in the container);
it is NOT part of the Scala library.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
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
        # decimals (DuckDB may emit Decimal objects) -> float: a decimal
        # column is dtype drift the kind check below should surface, but
        # keep sortability; do NOT touch int/float kinds here.
        elif df[c].dtype == "object" and len(df) and df[c].notna().any() and \
                isinstance(df[c].dropna().iloc[0],
                           __import__("decimal").Decimal):
            df[c] = df[c].astype("float64")
    sort_cols = [c for c in df.columns
                 if df[c].dtype.kind != "O" or df[c].map(
                     lambda v: v is None or isinstance(v, str)).all()]
    # floats participate in the sort via a rounded KEY so near-equal values
    # order identically on both sides; the compared values stay unrounded
    df = df.sort_values(
        by=sort_cols or list(df.columns),
        key=lambda s: s.round(9) if s.dtype.kind == "f" else s,
    ).reset_index(drop=True)
    return df


def kind(s: pd.Series) -> str:
    """Dtype family used for the strict comparison: int-like vs float vs
    other. uint/int/bool collapse (widths don't affect the driver's value
    hash); float32/float64 collapse; everything else compares exactly."""
    k = s.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def compare_cols(o: pd.DataFrame, s: pd.DataFrame) -> str | None:
    """Driver-faithful per-column compare. Returns an error string or None."""
    for c in o.columns:
        ko, ks = kind(o[c]), kind(s[c])
        if ko != ks:
            return (f"dtype mismatch on '{c}': oracle={o[c].dtype} ({ko}) "
                    f"spark={s[c].dtype} ({ks}) — the driver hashes these "
                    f"differently even if values are equal")
        if ko == "float":
            ov = o[c].astype("float64").to_numpy()
            sv = s[c].astype("float64").to_numpy()
            ok = np.isclose(ov, sv, rtol=1e-6, atol=0, equal_nan=True) | \
                (pd.isna(ov) & pd.isna(sv))
            if not ok.all():
                i = int(np.argmin(ok))
                return (f"float values differ on '{c}' at sorted row {i}: "
                        f"oracle={ov[i]!r} spark={sv[i]!r}")
        else:
            # int / bool / string / normalized dates: exact equality, nulls
            # must align exactly.
            ov, sv = o[c], s[c]
            neq = ~((ov == sv) | (ov.isna() & sv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                return (f"values differ on '{c}' at sorted row {i}: "
                        f"oracle={ov.iloc[i]!r} spark={sv.iloc[i]!r}")
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # Spark result first: a partial run (SPARK_GRAFT_VERIFY_ONLY)
        # must not pay every other query's oracle SQL before skipping it
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark result: {e}")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
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
        err = compare_cols(o, s)
        if err is None:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {err[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
