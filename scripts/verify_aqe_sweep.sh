#!/usr/bin/env bash
# AQE-off and speculation-on full-Verify sweeps — the r8 GlobalRank bug
# class gate (plan-identity assumptions broken by adaptive re-planning
# were caught by accident in r8; this scripts the hunt).
#
# Sweep 1: spark.sql.adaptive.enabled=false        (the non-AQE plans)
# Sweep 2: spark.speculation=true                  (duplicate task attempts)
#
# Usage: scripts/verify_aqe_sweep.sh [sfDir] [outBase]
# Then:  python3 scripts/compare.py <sfDir> <outBase>_aqe_off
#        python3 scripts/compare.py <sfDir> <outBase>_spec_on
#
# Runs the sbt-free Verify (build first: sbt compile). Every oracled row
# must hash-green under BOTH configurations — a diff means a plan-shape
# or task-retry dependence in the engine, not a corpus problem.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_sweep}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

CP="target/scala-2.13/classes:/opt/spark/jars/*"
COMMON="-Xmx${SPARK_DRIVER_MEM:-8g} -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

echo "== sweep 1: AQE off → ${OUT}_aqe_off"
# shellcheck disable=SC2086
java $ADD_OPENS $COMMON -Dspark.sql.adaptive.enabled=false \
  -cp "$CP" graft.Verify "$SF" "${OUT}_aqe_off"

echo "== sweep 2: speculation on → ${OUT}_spec_on"
# shellcheck disable=SC2086
java $ADD_OPENS $COMMON -Dspark.speculation=true \
  -Dspark.speculation.interval=50ms -Dspark.speculation.multiplier=1.2 \
  -Dspark.speculation.quantile=0.5 \
  -cp "$CP" graft.Verify "$SF" "${OUT}_spec_on"

echo "== done; now run compare.py on both output dirs"
