#!/bin/bash
# Anomaly-hunt loop: run graft.Bench N times with -XX:+PrintCompilation,
# saving each run's JSON line + compilation log. The per-query t0_ms/t1_ms
# stamps in jvm_stats line up with PrintCompilation's uptime column, so an
# anomalous query's JIT activity can be grepped out after the fact.
# Usage: tools/bench_loop.sh <n_runs> <sf_dir> <out_prefix> [extra JVM flags...]
set -u
N=${1:?n_runs}; SF=${2:?sf_dir}; PREFIX=${3:?out_prefix}; shift 3
CP="/opt/spark/jars/*:${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for i in $(seq 1 "$N"); do
  echo "=== run $i/$N $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$SF" java $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Duser.timezone=UTC \
    -Xmx16g -Xms6g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
    -XX:+PrintCompilation "$@" \
    -cp "$CP" graft.Bench \
    > "${PREFIX}_run${i}.jit" 2>"${PREFIX}_run${i}.err"
  # Bench prints the JSON line on stdout, which PrintCompilation shares —
  # the JSON line is the one starting with {"metric"
  grep -h '^{"metric"' "${PREFIX}_run${i}.jit" > "${PREFIX}_run${i}.json"
  tail -c 300 "${PREFIX}_run${i}.json"; echo
done
echo "=== loop done ==="
