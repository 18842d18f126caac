#!/bin/bash
# Targeted bench runner: replicates sbt's forked `runMain graft.Bench`
# with plain java so timing runs don't contend with a live sbt server.
# Usage: tools/run_bench.sh [query1,query2,...] [report_path]
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_BENCH_ITERS="${SPARK_GRAFT_BENCH_ITERS:-3}"
[ -n "$1" ] && export SPARK_GRAFT_BENCH_ONLY="$1"
export SPARK_GRAFT_BENCH_REPORT="${2:-/tmp/bench_targeted.json}"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" graft.Bench
