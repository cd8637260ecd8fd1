#!/bin/bash
# Replica of BASELINE.md's "sf1 NOISED fixture" measurement: build the
# deterministic-noise 10x fixture (ScaleUp --noise-text), then bench the
# pair-dedup family at sf0.1 and at the noised sf1. Exponent =
# log10(t_sf1 / t_sf0.1).
set -eu
cd "$(dirname "$0")/.."
DST=${1:-/tmp/sf1noise}
if [ ! -f "$DST/documents.parquet" ]; then
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $DST 10 --noise-text" >&2
fi
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
QS="dedup_minhash_near,dedup_ngram_jaccard,dedup_simhash,dedup_containment,dedup_multipass_blocking,dedup_cluster_cc,dedup_keep_list,dedup_threshold_sweep,dedup_media_histogram,dedup_sorted_neighborhood,dedup_paragraph_exact,dedup_edit_distance,pipeline_dedup_cascade,pipeline_chunk_dedup,dedup_normalized_hash"
for SF in /root/testdata/sf0.1 "$DST"; do
  echo "=== $SF"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 java $ADDOPENS \
    -Xmx8g -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench "$QS" \
    2>/dev/null | grep -o '{"metric.*'
done
