#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check — STRICT version.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver's observed comparison path (round-1 forensics):
  * Spark results are loaded with pandas.read_parquet (pyarrow) — so DECIMAL
    columns surface as Python Decimal objects and DATE columns as
    datetime.date objects;
  * oracle results come from duckdb's .df() — DECIMAL becomes float64, DATE
    becomes datetime64[us];
  * rows are sorted and every value compared via its pandas astype(str)
    representation with NO float tolerance. Decimal('10016.20') vs float
    10016.2 is a FAIL here exactly like it is at the driver.

Also keeps the stricter DuckDB DESCRIBE dtype cross-check from round 1.
Dev-only tooling — NOT part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # per-value string repr (matches pandas astype(str): datetime64 midnight
    # -> '1995-01-01', datetime.date -> '1995-01-01', NaN -> 'nan',
    # None -> 'None', Decimal('1.20') -> '1.20', float 1.2 -> '1.2')
    for c in df.columns:
        df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
            duck = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(spark.columns) != sorted(duck.columns):
            print(f"FAIL {name}: columns {sorted(spark.columns)} vs {sorted(duck.columns)}")
            n_bad += 1
            continue
        # strict dtype cross-check at the DuckDB level (both sides DESCRIBEd)
        gt = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
        et = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        tdiffs = {c: (gt.get(c), et.get(c)) for c in set(gt) | set(et)
                  if gt.get(c) != et.get(c)}
        if tdiffs:
            print(f"FAIL {name}: dtype mismatch {tdiffs}")
            n_bad += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: {len(spark)} rows vs oracle {len(duck)}")
            n_bad += 1
            continue
        a, b = canon(spark), canon(duck)
        if a.equals(b):
            print(f"ok   {name} ({len(a)} rows)")
            n_ok += 1
        else:
            neq = (a != b)
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = int(neq.any(axis=1).idxmax())
            print(f"FAIL {name}: cols {bad_cols}; first bad row {i}: "
                  f"spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
