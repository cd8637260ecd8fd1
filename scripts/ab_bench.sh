#!/bin/bash
# r14 A/B helper: time the same query list from two classes snapshots,
# alternating A,B,A,B,A,B, and report per-row MIN over the 3 runs of
# each side (robust to the measured ±30-50% transient noise between
# back-to-back targeted runs on this host). Usage:
#   scripts/ab_bench.sh <snapA> <snapB> q1,q2,...
set -eu
SNAPA="$1"; SNAPB="$2"; QS="$3"; REPS="${4:-3}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # $1 snap, $2 out
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$2" \
    java $ADD_OPENS -Xmx12g -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" graft.Bench "$QS" >/dev/null 2>&1
}
rm -f /tmp/ab_a_*.json /tmp/ab_b_*.json
for i in $(seq 1 "$REPS"); do
  run "$SNAPA" "/tmp/ab_a_$i.json"
  run "$SNAPB" "/tmp/ab_b_$i.json"
done
python3 - "$REPS" <<'EOF'
import json, sys
reps = int(sys.argv[1])
def mins(pref):
    out = {}
    for i in range(1, reps + 1):
        q = json.load(open(f'/tmp/{pref}_{i}.json'))['queries']
        for k, v in q.items():
            out[k] = min(out.get(k, 1e9), v)
    return out
a, b = mins('ab_a'), mins('ab_b')
ta = tb = 0.0
for k in sorted(a, key=lambda k: -a[k]):
    ta += a[k]; tb += b.get(k, 0)
    print(f'{a[k]:7.2f} -> {b.get(k,0):6.2f}  ({b.get(k,0)/a[k]:4.2f}x)  {k}')
print(f'{ta:7.2f} -> {tb:6.2f}  TOTAL ({tb/ta:4.2f}x) [min of {reps}]')
EOF
