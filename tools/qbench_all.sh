#!/bin/bash
# Standalone steady-state sweep: fresh JVM per query, 2 reps, record rep2.
# Produces a "name rep2_sec" table on stdout (rep1 lines go to the log).
# Usage: tools/qbench_all.sh <sf_dir> [names...]; default = all queries.
set -u
SF=${1:?sf_dir}; shift
CP="/opt/spark/jars/*:/root/repo/target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
if [ $# -gt 0 ]; then NAMES="$*"; else
  NAMES=$(SPARK_GRAFT_QUERY_LIST=1 java $OPENS -cp "$CP" graft.QBench --list)
fi
for n in $NAMES; do
  out=$(SPARK_GRAFT_SF_DIR="$SF" java $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Duser.timezone=UTC \
    -Xmx16g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
    -cp "$CP" graft.QBench "$n" 2 2>/dev/null | grep '\[qbench\]')
  echo "$out" >&2
  rep2=$(echo "$out" | grep rep2 | awk '{print $4}' | tr -d 's')
  echo "$n $rep2"
done
