#!/usr/bin/env python3
"""Aggregate a ChaosGate run into the SCALE record's chaos_gate block.

A (query, backend) counts as PASSED iff at least one chaos invocation
killed an executor MID-QUERY (killed_during=true) and the query
survived with a hash identical to the clean reference. Invocations
where the kill missed the query window are recorded but prove nothing.
The `local` backend is expected to FAIL (survived=false) — that row is
reported under expected_local_failures.

`local` carries no durability guarantee, so each mid-kill run is
classified per-run: a loud failure (survived=false with an error), a
correct survival (the victim held none of the pins' blocks — possible
with 2 executors), or SILENT_WRONG (survived with a hash that differs
from clean). The demonstration the gate requires is >=1 loud failure
and ZERO silent-wrong runs: losing an executor under `local` may cost
you the job, never the answer.

Usage: python3 tools/chaos_summarize.py <chaosDir>  # clean.jsonl + chaos.jsonl
"""
import json
import sys

d = sys.argv[1]
clean = {}
for line in open(f"{d}/clean.jsonl"):
    j = json.loads(line)
    clean[j["query"]] = j["hash"]

runs = []
for line in open(f"{d}/chaos.jsonl"):
    line = line.strip()
    if not line or line == "DONE":
        continue
    runs.append(json.loads(line))

by_qb = {}
for r in runs:
    by_qb.setdefault((r["query"], r["backend"]), []).append(r)

passed, failed, missed, local_rows = [], [], [], []
for (q, b), rs in sorted(by_qb.items()):
    mid = [r for r in rs if r.get("killed_during")]
    if b == "local":
        for r in mid:
            if not r.get("survived"):
                outcome = "loud_failure"
            elif r.get("hash") == clean[q]:
                outcome = "survived_correct"
            else:
                outcome = "SILENT_WRONG"
            local_rows.append({"query": q, "outcome": outcome,
                               "error": (r.get("error") or "")[:140],
                               "wall_ms": r.get("wall_ms")})
        continue
    hit = next((r for r in mid if r.get("survived")
                and r.get("hash") == clean[q]), None)
    if hit:
        passed.append({"query": q, "backend": b,
                       "jobs_at_kill": hit["jobs_at_kill"],
                       "wall_ms": hit["wall_ms"]})
    elif mid:
        failed.append({"query": q, "backend": b,
                       "detail": [
                           {k: r.get(k) for k in
                            ("survived", "hash", "error", "wall_ms")}
                           for r in mid]})
    else:
        missed.append({"query": q, "backend": b})

local_loud = sum(1 for r in local_rows if r["outcome"] == "loud_failure")
local_silent_wrong = sum(1 for r in local_rows
                         if r["outcome"] == "SILENT_WRONG")
out = {
    "family_size": len(clean),
    "passed": len(passed),
    "failed": len(failed),
    "kill_missed_entirely": missed,
    "failures": failed,
    "per_query": passed,
    "local_backend_runs": local_rows,
    "local_loud_failures": local_loud,
    "local_silent_wrong": local_silent_wrong,
}
print(json.dumps(out, indent=1))
ok = (not failed and not missed
      and local_loud >= 1 and local_silent_wrong == 0)
sys.exit(0 if ok else 1)
