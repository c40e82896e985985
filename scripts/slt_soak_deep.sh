#!/usr/bin/env bash
# Deep SLT soak (round 7): the named select*.test / xtdb.test corpora run
# UNCAPPED (every query in the file), random/ and index/ at a 400/file cap
# (the full random+index corpus is ~7M queries — days of wall clock; the
# cap quadruples round-6's coverage while staying inside a session).
# Runs graft.slt.SltMain directly with java (no sbt lock), then writes
# SLT_SOAK.json with per-target results and the cap protocol recorded.
set -euo pipefail
cd "$(dirname "$0")/.."
CORPUS=/root/reference/sqlite-test
CAP="${1:-400}"
CLASSES="${GRAFT_CLASSES:-target/scala-2.13/classes}"
LOG=$(mktemp /tmp/slt_soak_deep.XXXXXX.log)

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_target() {
  local t="$1" cap="$2"
  echo "== $t (cap $cap/file) =="
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" \
    graft.slt.SltMain "$t" "$cap" 2>/dev/null \
    | grep -a "^SLT" | tee -a "$LOG" || true
}

# random/index first: they are the raised-cap portion a partial-session
# soak most needs on record; the named files follow.
run_target "$CORPUS/random" "$CAP"
run_target "$CORPUS/index" "$CAP"
for f in select1 select2 select3 select4 select5 xtdb; do
  run_target "$CORPUS/$f.test" 1000000
done

python3 - "$LOG" "$CAP" <<'EOF'
import json, re, sys
log, cap = sys.argv[1], int(sys.argv[2])
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
out = {"protocol": ("select1-5.test + xtdb.test uncapped (full files); "
                    f"random/ + index/ at {cap} queries/file "
                    "(full corpus ~7M queries)"),
       "named_files_uncapped": True,
       "max_queries_per_file_random_index": cap,
       "passed": tot_pass, "failed": tot_fail,
       "files": len(targets), "per_file": targets}
json.dump(out, open("SLT_SOAK.json", "w"), indent=1)
print(f"SLT_SOAK.json: {tot_pass} passed, {tot_fail} failed "
      f"across {len(targets)} files")
EOF
