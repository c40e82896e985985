#!/bin/bash
# Round-12 ask #6 made standing: the FULL correctness gate at the 25x
# scale point — the cheapest guard against scale-variant thresholds in
# the gate queries (the q223 class; round 12 caught q107/q159's fixed
# +100000 offset and the q01/q05/q07 float-rounding class this way).
#
# Derives the 25x set from sf0.1 if absent, runs graft.Verify over it,
# then cross-checks against DuckDB with a per-oracle timeout (some
# DuckDB replays — the semantic/LSH oracles — are quadratic at 25x;
# those report SKIP ORACLE-TIMEOUT, not failures; the Spark side must
# still have produced output for every query).
#
# Usage: scripts/verify_25x.sh [dstDir] [outDir]
#   dstDir  default /tmp/scale25x (reused if it already exists)
#   outDir  default a fresh temp dir
# Env: ORACLE_TIMEOUT_SEC (default 300), SPARK_GRAFT_CPUS (default 16)
set -e
cd "$(dirname "$0")/.." || exit 1
DST="${1:-/tmp/scale25x}"
OUT="${2:-$(mktemp -d /tmp/graft_verify25x.XXXX)}"
CPUS="${SPARK_GRAFT_CPUS:-16}"
export ORACLE_TIMEOUT_SEC="${ORACLE_TIMEOUT_SEC:-300}"

sbt -batch compile

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# every table must be present — a partially-derived set (interrupted
# ScaleData) must be rebuilt, not reused forever
COMPLETE=1
for t in region nation customer supplier part orders lineitem events \
         documents embeddings; do
  [ -e "$DST/$t.parquet" ] || COMPLETE=0
done
if [ "$COMPLETE" != 1 ]; then
  echo "== deriving 25x set at $DST =="
  SPARK_GRAFT_CPUS="$CPUS" java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ScaleData /root/testdata/sf0.1 "$DST" 25 16
fi

# a crashed Verify must FAIL the audit, not hand stale/absent dumps to
# the oracle — keep the JVM's own exit status through the log filter
VLOG=$(mktemp /tmp/graft_verify25x_log.XXXX)
SPARK_GRAFT_CPUS="$CPUS" java $ADD_OPENS -Xmx24g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$DST" "$OUT" > "$VLOG" 2>&1
grep "\[verify\]" "$VLOG" || true

python3 scripts/oracle_check.py "$DST" "$OUT"
