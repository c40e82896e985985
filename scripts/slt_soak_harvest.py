#!/usr/bin/env python3
"""Aggregate a sharded SLT sweep's logs into SLT_SOAK.json.
Usage: slt_soak_harvest.py <logDir> <outFile> [note...]"""
import glob
import json
import re
import sys

log_dir, out = sys.argv[1], sys.argv[2]
note = " ".join(sys.argv[3:])
line = re.compile(r"^SLT (\S+): (\d+)/(\d+) passed(?: \((\d+) skipped\))?")
files = 0
passed = 0
total = 0
skipped = 0
fails = []
for log in sorted(glob.glob(f"{log_dir}/*.log")):
    with open(log) as fh:
        for ln in fh:
            m = line.match(ln)
            if m:
                files += 1
                passed += int(m.group(2))
                total += int(m.group(3))
                skipped += int(m.group(4) or 0)
            elif ln.startswith("  FAIL"):
                fails.append(ln.strip()[:400])
doc = {
    "mode": "uncapped",
    "files_completed": files,
    "queries_passed": passed,
    "queries_run": total,
    "queries_failed": total - passed,
    "skipped_other_db_only": skipped,
    "failures": fails[:50],
    "note": note,
}
with open(out, "w") as fh:
    json.dump(doc, fh, indent=1)
print(json.dumps(doc)[:400])
