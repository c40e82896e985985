#!/usr/bin/env bash
# Full-corpus SLT soak: run the reference's own sqlite-test corpus
# (/root/reference/sqlite-test — 592 .test files) through graft.slt.SltMain
# and record per-target and total pass/fail counts in SLT_SOAK.json.
#
# Usage: scripts/slt_soak.sh [maxQueriesPerFile]
#   default cap 150 queries/file (the full corpus is ~5M queries; the cap
#   gives ~90k queries in about an hour — raise it for a deeper soak).
set -euo pipefail
cd "$(dirname "$0")/.."
MAXQ="${1:-150}"
CORPUS=/root/reference/sqlite-test
LOG=$(mktemp /tmp/slt_soak.XXXXXX.log)

targets=("$CORPUS"/select1.test "$CORPUS"/select2.test "$CORPUS"/select3.test
         "$CORPUS"/select4.test "$CORPUS"/select5.test "$CORPUS"/xtdb.test
         "$CORPUS"/random "$CORPUS"/index)

for t in "${targets[@]}"; do
  [ -e "$t" ] || continue
  echo "== $t (cap $MAXQ/file) =="
  sbt -batch "runMain graft.slt.SltMain $t $MAXQ" 2>&1 \
    | grep -a "^\[info\] SLT" | sed 's/^\[info\] //' | tee -a "$LOG"
done

python3 - "$LOG" "$MAXQ" <<'EOF'
import json, re, sys
log, maxq = sys.argv[1], int(sys.argv[2])
targets, tot_pass, tot_fail = {}, 0, 0
for line in open(log):
    m = re.match(r"SLT TOTAL: (\d+) passed, (\d+) failed", line)
    if m:
        tot_pass += int(m.group(1)); tot_fail += int(m.group(2))
        continue
    m = re.match(r"SLT (\S+): (\d+)/(\d+) passed", line)
    if m:
        targets[m.group(1)] = {"passed": int(m.group(2)),
                               "total": int(m.group(3))}
out = {"max_queries_per_file": maxq, "passed": tot_pass,
       "failed": tot_fail, "files": len(targets), "per_file": targets}
json.dump(out, open("SLT_SOAK.json", "w"), indent=1)
print(f"SLT_SOAK.json: {tot_pass} passed, {tot_fail} failed "
      f"across {len(targets)} files")
EOF
