#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet that graft.Verify wrote, runs the matching
oracle_sql.json entry in DuckDB over the same fixture parquet, and compares
(sorted columns, sorted rows, exact for non-floats / 1e-9-relative for
floats). Dev-only tooling — NOT part of the shipped library.
"""
import json, math, sys
import duckdb

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, gr = norm(grows, gcols)
        ec, er = norm(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_bad += 1
            continue
        # strict dtype comparison (duckdb DESCRIBE both sides)
        gt = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
        et = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        tdiffs = {c: (gt.get(c), et.get(c)) for c in set(gt) | set(et)
                  if gt.get(c) != et.get(c)}
        if tdiffs:
            print(f"FAIL {name}: dtype mismatch {tdiffs}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: {len(gr)} rows vs oracle {len(er)}")
            n_bad += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} oracle={bad[2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
