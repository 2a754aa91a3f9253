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

Round-9 hardening (the q_ktruss lesson — an oracle that needed ~70 GB and
~6 min at sf0.01 passed this check on a 128 GiB box, then OOM-killed the
driver's gate and zeroed CORRECTNESS_r08.json for all 281 queries):
  * DuckDB runs under a DRIVER-REALISTIC envelope: memory_limit='24GB'
    (override: ORACLE_MEMORY_LIMIT) — a resource-bomb oracle now fails
    HERE, loudly, before it ships;
  * every oracle query gets a wall-clock budget (default 120 s, override:
    ORACLE_TIMEOUT_SEC) enforced via duckdb's interrupt() from a watchdog
    thread — a FAIL, not a hang;
  * per-query oracle runtimes are persisted to <outDir>/oracle_timings.json
    so creeping oracle cost is visible in review instead of discovered at
    the gate.
Dev-only tooling — NOT part of the shipped library.
"""
import json
import os
import sys
import threading
import time

import duckdb
import pandas as pd

MEM_LIMIT = os.environ.get("ORACLE_MEMORY_LIMIT", "24GB")
TIMEOUT_SEC = float(os.environ.get("ORACLE_TIMEOUT_SEC", "120"))


def run_with_budget(con, sql: str):
    """Run `sql` under the per-query wall budget; raises on timeout/OOM.

    The query runs on its OWN cursor (a duckdb cursor is a sibling
    connection over the same database, so the session's views stay
    visible): the watchdog has an inherent race — the timeout can elapse
    just as execute() returns, firing interrupt() after completion — and
    on a shared connection that stray interrupt would spuriously cancel
    the NEXT query in the loop (round-9 advice finding). Scoped to a
    per-query cursor that is closed before returning, a late interrupt
    has nothing to land on. The watchdog is also joined after done.set()
    so it can never outlive its query.
    """
    cur = con.cursor()
    done = threading.Event()
    timed_out = []

    def watchdog():
        if not done.wait(TIMEOUT_SEC):
            timed_out.append(True)
            cur.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        df = cur.execute(sql).df()
    except Exception as e:  # noqa: BLE001 - re-raise with budget context
        if timed_out:
            raise RuntimeError(
                f"oracle exceeded {TIMEOUT_SEC:.0f}s budget (interrupted)") from e
        raise
    finally:
        done.set()
        w.join()
        cur.close()
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # per-value string repr (matches pandas astype(str): datetime64 midnight
    # -> '1995-01-01', datetime.date -> '1995-01-01', NaN -> 'nan',
    # None -> 'None', Decimal('1.20') -> '1.20', float 1.2 -> '1.2')
    for c in df.columns:
        df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, only=None) -> None:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver fixtures are single files; Spark-written scale fixtures
        # (dev/ScaleUp output) are directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    timings = {}
    skipped = []
    for name, sql in sorted(oracle.items()):
        # targeted mode (3rd arg = the SAME comma list passed to
        # graft.Verify): queries outside the filter are skipped; a
        # missing dump INSIDE the filter — or any missing dump in full
        # mode — stays a loud FAIL + exit 1. (A first cut skipped every
        # missing dump, which would let a full run with a silently
        # undumped query pass the gate — the exact failure mode this
        # round's hardening exists to prevent; review finding.)
        if only is not None and name not in only:
            skipped.append(name)
            continue
        t0 = time.monotonic()
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
            t0 = time.monotonic()
            duck = run_with_budget(con, sql)
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report and continue
            timings[name] = round(time.monotonic() - t0, 3)
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
            print(f"ok   {name} ({len(a)} rows, oracle {timings[name]:.2f}s)")
            n_ok += 1
        else:
            neq = (a != b)
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = int(neq.any(axis=1).idxmax())
            print(f"FAIL {name}: cols {bad_cols}; first bad row {i}: "
                  f"spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}")
            n_bad += 1
    with open(f"{out_dir}/oracle_timings.json", "w") as f:
        json.dump({"memory_limit": MEM_LIMIT, "timeout_sec": TIMEOUT_SEC,
                   "timings_sec": dict(sorted(
                       timings.items(), key=lambda kv: -kv[1]))}, f, indent=1)
    slow = {k: v for k, v in timings.items() if v > TIMEOUT_SEC / 4}
    if slow:
        print(f"SLOW oracles (>{TIMEOUT_SEC / 4:.0f}s of {TIMEOUT_SEC:.0f}s "
              f"budget): {slow}")
    if skipped:
        print(f"SKIPPED {len(skipped)} outside the query filter: "
              f"{skipped[:8]}{'...' if len(skipped) > 8 else ''}")
    print(f"\n{n_ok} ok, {n_bad} failed "
          f"(memory_limit={MEM_LIMIT}, timeout={TIMEOUT_SEC:.0f}s/query)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
