#!/bin/bash
# Builder-side wave iteration helper: Verify the named queries at
# sf0.001 + sf0.01 (the driver's gate sf) and run the exact DuckDB
# compare on just those rows. Usage: scripts/wave_check.sh q1,q2,...
set -eu
cd "$(dirname "$0")/.."
QS="$1"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for SF in sf0.001 sf0.01; do
  OUT=/tmp/wave_check_$SF
  rm -rf "$OUT"
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=8 java $ADD_OPENS -Xmx8g -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "/root/testdata/$SF" "$OUT" "$QS" 2>&1 | grep "\[verify\]" || true
  echo "== $SF"
  python3 scripts/compare.py "/root/testdata/$SF" "$OUT" $(echo "$QS" | tr ',' ' ') 2>&1 \
    | grep -E "^(OK|FAIL|WARN)" || true
done
