#!/bin/bash
# One-invocation replica of the driver's correctness gate (what the judge
# runs): compile, dump every SparkEntry query to parquet with graft.Verify
# (java-direct — skips sbt startup), then cross-check each against the
# DuckDB oracle. Expect the last line to read "== N ok, 0 fail ==".
#
# Usage: scripts/verify_run.sh [sfDir] [outDir]
#   sfDir  default /root/testdata/sf0.01 (the driver's gate SF)
#   outDir default a fresh temp dir
# Env: SPARK_GRAFT_ONLY=q1,q2  restrict to named queries (fast iteration;
#      oracle_check then reports the rest as missing-output noise)
#      SPARK_GRAFT_CPUS        worker threads (default 16)
set -e
cd "$(dirname "$0")/.." || exit 1
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-$(mktemp -d /tmp/graft_verify.XXXX)}"
CPUS="${SPARK_GRAFT_CPUS:-16}"

sbt -batch compile

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

SPARK_GRAFT_CPUS="$CPUS" java $ADD_OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>&1 | grep "\[verify\]" || true

python3 scripts/oracle_check.py "$SF" "$OUT"
