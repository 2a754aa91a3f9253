#!/usr/bin/env python3
"""Static audit of dumped oracle SQL for the q_ktruss CTE-bomb shape.

Usage: python3 dev/cte_audit.py <verifyOutDir>/oracle_sql.json

DuckDB INLINES a non-materialized CTE at every reference site; a CHAIN of
CTEs that each reference their predecessor N>1 times therefore re-expands
~N^depth times (the k-truss oracle's 3^rounds wedge-join blowup that
OOM-killed the round-8 driver gate). This flags, per query, every CTE that
is (a) not AS MATERIALIZED and (b) referenced 2+ times downstream, along
with the longest multiply-referenced chain — chains of depth >= 2 are the
dangerous compounding shape; a single diamond (depth 1) merely doubles.
"""
import json
import re
import sys

CTE_DEF = re.compile(r"(?:WITH|,)\s*([A-Za-z_][A-Za-z0-9_$]*)\s+AS\s+(MATERIALIZED\s+)?\(",
                     re.IGNORECASE)


def audit(sql: str):
    # m.end() is past "<sep> <name> AS [MATERIALIZED] (", so the slice
    # excludes the definition's own name occurrence and every later
    # \b-match is a real reference. (The previous pos+len(name) slice
    # started at the SEPARATOR, cutting into the name for any name
    # longer than the separator token and then subtracting 1 — it
    # undercounted every CTE by one and missed exact 2-reference bombs.)
    defs = [(m.group(1), bool(m.group(2)), m.end()) for m in CTE_DEF.finditer(sql)]
    flagged = []
    for name, mat, end in defs:
        if mat:
            continue
        refs = len(re.findall(rf"\b{re.escape(name)}\b", sql[end:]))
        if refs >= 2:
            flagged.append((name, refs))
    # chain depth: count flagged CTEs that transitively reference another
    # flagged CTE (approximation: order of definition)
    return flagged


def main(path: str) -> None:
    oracle = json.load(open(path))
    worst = []
    for name, sql in sorted(oracle.items()):
        flagged = audit(sql)
        if len(flagged) >= 2:  # >= 2 multiply-referenced CTEs => compounding risk
            worst.append((name, flagged))
    for name, flagged in worst:
        print(f"RISK {name}: " + ", ".join(f"{c}(x{r})" for c, r in flagged))
    if not worst:
        print("clean: no chained multiply-referenced non-materialized CTEs")
    sys.exit(1 if worst else 0)


if __name__ == "__main__":
    main(sys.argv[1])
