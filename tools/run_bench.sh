#!/bin/bash
# Self-run of the official bench exactly as the driver runs it (defaults).
# Usage: tools/run_bench.sh [outfile]
set -u
OUT="${1:-/tmp/bench_self.log}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
T0=$(date +%s)
java $ADD_OPENS -Xmx48g -XX:+UseParallelGC -Xmn20g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench > "$OUT" 2>&1
RC=$?
T1=$(date +%s)
echo "rc=$RC wall=$((T1-T0))s" >> "$OUT"
echo "rc=$RC wall=$((T1-T0))s"
tail -c 1200 "$OUT" | grep -o '{"metric".*}' | tail -1
