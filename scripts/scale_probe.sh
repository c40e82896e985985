#!/bin/bash
# Core-count scaling probe at the 25x scale point (VERDICT r17 #7): the
# sf0.1 bench is scheduler/job-floor-bound (every query 0.07-0.33 s
# against a 20-40 ms/job driver floor), so the driver's 32-vs-8-core
# axis measures nothing there; at 25x the data path carries real work
# and a serial operator becomes visible as a low/high-core ratio ~1.
#
# Runs graft.Bench twice on the 25x set (32 and 8 cores), then emits one
# JSON artifact with per-query hot seconds and the low/high ratio
# (ratio >> 1 = scales with cores; ~1 = core-insensitive — flagged
# unless driver-floor-explained, i.e. the 32-core hot time is already
# near the per-job floor).
#
# Usage: scripts/scale_probe.sh [dstDir] [outFile]
#   dstDir  default /tmp/scale25x (derived from sf0.1 if missing, same
#           as verify_25x.sh)
#   outFile default SCALING_25X.json
set -e
cd "$(dirname "$0")/.." || exit 1
DST="${1:-/tmp/scale25x}"
OUTF="${2:-SCALING_25X.json}"

sbt -batch compile > /dev/null

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

COMPLETE=1
for t in region nation customer supplier part orders lineitem events \
         documents embeddings; do
  [ -e "$DST/$t.parquet" ] || COMPLETE=0
done
if [ "$COMPLETE" != 1 ]; then
  echo "[scale_probe] deriving 25x set into $DST"
  java $ADD_OPENS -Xmx24g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ScaleData /root/testdata/sf0.1 "$DST" 25
fi

run_bench() { # cpus outfile
  SPARK_GRAFT_SF_DIR="$DST" SPARK_GRAFT_CPUS="$1" SPARK_DRIVER_MEM=24g \
    scripts/bench_run.sh "$2"
}
echo "[scale_probe] bench at 32 cores"
run_bench 32 /tmp/scale_probe_c32.json
echo "[scale_probe] bench at 8 cores"
run_bench 8 /tmp/scale_probe_c8.json

python3 - "$OUTF" <<'EOF'
import json, sys
hi = json.load(open("/tmp/scale_probe_c32.json"))
lo = json.load(open("/tmp/scale_probe_c8.json"))
qs = {}
for k, vhi in hi["queries"].items():
    vlo = lo["queries"].get(k)
    if vlo is None:
        continue
    qs[k] = {"c32_sec": vhi, "c8_sec": vlo,
             "low_over_high": round(vlo / vhi, 3) if vhi > 0 else None}
out = {
    "set": "25x of sf0.1",
    "cpus_high": 32, "cpus_low": 8,
    "total_c32": hi["value"], "total_c8": lo["value"],
    "steal_c32": hi.get("steal_ticks"), "steal_c8": lo.get("steal_ticks"),
    "per_query": qs,
    "flag_note": ("low_over_high ~1 on a query whose c32 hot time is well "
                  "above the ~0.1 s multi-job floor would indicate a "
                  "serial operator"),
}
json.dump(out, open(sys.argv[1], "w"), indent=1)
print("[scale_probe] wrote", sys.argv[1])
EOF
