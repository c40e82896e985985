#!/usr/bin/env python3
"""Assemble SLT_SOAK.json from the round-8 parallel-runner logs.

Round-8 protocol: random/ + index/ at 1000 queries/file (2.5x the
round-7 cap), named select1-5/xtdb uncapped, executed by parallel
java-direct runners from a class snapshot. Per-file lines are emitted
on file completion only, so every line is a full result; duplicate
coverage across runners dedups by file path (results are
deterministic - when both ran a file, the counts agree).
"""
import glob
import json
import re
import sys

logs = sorted(glob.glob("/tmp/slt_soak_r8*.out"))
per_file = {}
dup_mismatch = []
for log in logs:
    try:
        text = open(log, errors="replace").read()
    except OSError:
        continue
    for m in re.finditer(
            r"^SLT (\S+): (\d+)/(\d+) passed", text, re.M):
        f, p, t = m.group(1), int(m.group(2)), int(m.group(3))
        if f in per_file and per_file[f] != (p, t):
            dup_mismatch.append((f, per_file[f], (p, t)))
            per_file[f] = max(per_file[f], (p, t))
        else:
            per_file[f] = (p, t)

tot_pass = sum(p for p, _ in per_file.values())
tot_total = sum(t for _, t in per_file.values())
named = [f for f in per_file if f.endswith((".test",)) and
         "/random/" not in f and "/index/" not in f]
out = {
    "protocol": (
        "round-8: random/ + index/ at 1000 queries/file (2.5x the "
        "round-7 cap of 400), select1-5.test + xtdb.test uncapped; "
        "executed by parallel java-direct runners from a class "
        "snapshot within one session. Coverage below is the files "
        "COMPLETED in-session; the round-7 full-corpus sweep at "
        "400/file (240,287/240,288) remains on record for files not "
        "re-reached at the raised cap."),
    "max_queries_per_file_random_index": 1000,
    "named_files_uncapped": True,
    "passed": tot_pass,
    "failed": tot_total - tot_pass,
    "files": len(per_file),
    "named_files_completed": sorted(
        f.rsplit("/", 1)[-1] for f in named),
    "duplicate_coverage_mismatches": len(dup_mismatch),
    "per_file": {f: {"passed": p, "total": t}
                 for f, (p, t) in sorted(per_file.items())},
}
json.dump(out, open("SLT_SOAK.json", "w"), indent=1)
print(f"SLT_SOAK.json: {tot_pass} passed, {tot_total - tot_pass} failed "
      f"across {len(per_file)} files; dup mismatches: {len(dup_mismatch)}")
if dup_mismatch:
    for f, a, b in dup_mismatch[:10]:
        print(" MISMATCH", f, a, b)
    sys.exit(1)
