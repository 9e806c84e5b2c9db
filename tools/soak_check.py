#!/usr/bin/env python3
"""DuckDB cross-check for a DaemonSoak run (driver-side python, like
tools/check.py): for every stream the soak's writers recorded in
expected.json, read the daemon's output parquet in DuckDB and compare
row count and the exact integer-valued checksum column.

Usage: python3 tools/soak_check.py <soakWorkDir>
Exit 0 iff every stream matches.
"""
import glob, json, os, sys

import duckdb

work = sys.argv[1]
expected = json.load(open(os.path.join(work, "expected.json")))
con = duckdb.connect()

n_pass = n_fail = 0
for e in expected:
    s, rows, sum_v, kind = e["stream"], e["rows"], e["sum_v"], e["kind"]
    out = os.path.join(work, "out", s, "data.parquet")
    # spark part layout: data.parquet may be a directory of parts
    target = out if os.path.isfile(out) else os.path.join(out, "*.parquet")
    try:
        if kind.startswith("vw"):
            got = con.sql(
                f"SELECT count(*) n, coalesce(sum(octet_length(blob)),0) s"
                f" FROM '{target}'").fetchone()
        else:
            got = con.sql(
                f"SELECT count(*) n, coalesce(sum(CAST(v AS BIGINT)),0) s"
                f" FROM '{target}'").fetchone()
        ok = got[0] == rows and int(got[1]) == sum_v
        # every row must carry a distinct sample_index (derived column)
        idx = con.sql(
            f"SELECT count(DISTINCT sample_index) FROM '{target}'"
        ).fetchone()[0]
        ok = ok and idx == rows
    except Exception as ex:
        ok, got, idx = False, ("ERR", str(ex)[:120]), -1
    if ok:
        n_pass += 1
    else:
        n_fail += 1
        print(f"FAIL {s} ({kind}): expected rows={rows} sum={sum_v}, "
              f"got {got} distinct_idx={idx}")

print(f"soak_check: {n_pass} pass / {n_fail} fail / {len(expected)} streams")
sys.exit(0 if n_fail == 0 else 1)
