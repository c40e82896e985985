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
# dedupe by file path, keeping the LAST occurrence in glob order — a
# fixed-and-rerun file's clean result (zz_*.log) supersedes its earlier
# failing record
per_file = {}
for log in sorted(glob.glob(f"{log_dir}/*.log")):
    with open(log) as fh:
        cur = None
        for ln in fh:
            m = line.match(ln)
            if m:
                cur = m.group(1)
                per_file[cur] = [int(m.group(2)), int(m.group(3)),
                                 int(m.group(4) or 0), []]
            elif ln.startswith("  FAIL") and cur:
                per_file[cur][3].append(ln.strip()[:400])
# a record whose failures are JVM-shutdown artifacts (the sweep was
# killed mid-file: every in-flight query errors with a stopped-context
# message and the runner logs the file before dying) is NOT a completed
# file — drop it entirely rather than report teardown noise as engine
# failures
shutdown = ("stopped SparkContext", "Task serialization failed",
            'The "collect" action failed',
            "Eagerly executed command failed")
per_file = {k: v for k, v in per_file.items()
            if not any(any(s in f for s in shutdown) for f in v[3])}
files = len(per_file)
passed = sum(v[0] for v in per_file.values())
total = sum(v[1] for v in per_file.values())
skipped = sum(v[2] for v in per_file.values())
fails = [f for v in per_file.values() for f in v[3]]
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
