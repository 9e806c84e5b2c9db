#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

For each query dir under verifyOutDir: load the Spark-written parquet,
run the corresponding oracle SQL from oracle_sql.json in DuckDB over the
same source tables, sort columns by name and rows by all columns, then
compare cell-by-cell (exact for non-floats, tiny epsilon report for
floats so we can see whether a mismatch is ulp-level or real).
"""
import duckdb, glob, json, math, os, sys

import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

n_pass = n_fail = 0

# Verify.scala records every declared query that threw in errors.json —
# surface those as failures here too, so a dead query can never read as
# "absent therefore fine" (the round-6 silent-failure mode).
threw = {}
err_path = f"{OUT}/errors.json"
if os.path.exists(err_path):
    threw = json.load(open(err_path))
    for name, msg in sorted(threw.items()):
        print(f"FAIL {name}: query threw: {msg}")
        n_fail += 1

for name in sorted(oracle):
    if name in threw:
        continue  # already counted above; don't double-fail on no-output
    sql = oracle[name]
    qdir = f"{OUT}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        exp = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
    act = norm(con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df())
    if list(exp.columns) != list(act.columns):
        print(f"FAIL {name}: cols oracle={list(exp.columns)} spark={list(act.columns)}")
        n_fail += 1; continue
    if len(exp) != len(act):
        print(f"FAIL {name}: rows oracle={len(exp)} spark={len(act)}")
        n_fail += 1; continue
    bad = []
    for c in exp.columns:
        e, a = exp[c], act[c]
        # Driver-strict dtype gate: the driver hashes values as rendered
        # by their dtype, so an int64 Spark column vs a float64 (e.g.
        # HUGEINT-widened) oracle column hash-mismatches even when every
        # value is numerically identical. Fail on kind mismatch here so
        # local green implies driver green.
        ek, ak = e.dtype.kind, a.dtype.kind
        if ek != ak and {ek, ak} & {"f", "i", "u"} and not (
                {ek, ak} <= {"i", "u"}):
            bad.append(f"{c}: dtype mismatch oracle={e.dtype} spark={a.dtype}")
            continue
        if e.dtype.kind == "f" or a.dtype.kind == "f":
            ef = pd.to_numeric(e, errors="coerce").astype(float)
            af = pd.to_numeric(a, errors="coerce").astype(float)
            neq = ~((ef == af) | (ef.isna() & af.isna()))
            if neq.any():
                d = (ef - af).abs().max()
                bad.append(f"{c}: {int(neq.sum())} diffs, maxabs={d:.3e}")
        else:
            es, as_ = e.astype(str), a.astype(str)
            neq = es != as_
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: oracle={es[i]!r} spark={as_[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
