#!/bin/bash
# Low-memory spill exhibit (r8 verdict task #5): run the most expensive
# bench rows under a 2 GiB heap with only 4 shuffle partitions — a
# deliberately starved executor profile no regular local[32]/8g run
# exercises — and record that they COMPLETE (spill paths work) plus
# their times. 100 TB design claims hinge on spill behavior; this is
# the one-command replica for BASELINE.md's "low-memory spill" row.
#
# Usage: scripts/spill_exhibit.sh [sfDir]   (default /root/testdata/sf0.1)
set -u
SF=${1:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# r12 refresh (r11 verdict task #6): the r11 bench's most expensive
# rows — including the post-fix stat_median_ci_exact — + the AQE skew
# exhibit
QS="dedup_embed_cosine,dedup_prefix_filter_join,embed_pca_power,embed_cosine_euclid_concordance,stat_median_ci_exact,join_skew_aqe"
echo "spill exhibit: sf=$SF  heap=2g  local[4]/shuffle.partitions=4" >&2
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=4 java $ADDOPENS \
  -Xmx2g -XX:ReservedCodeCacheSize=256m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench "$QS" \
  2>/dev/null | grep -o '{"metric.*'
