#!/bin/bash
# Targeted verify runner (plain java, no sbt contention).
# Usage: tools/run_verify.sh <sfdir> <outdir> [query1,query2,...]
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"
[ -n "$3" ] && export SPARK_GRAFT_VERIFY_ONLY="$3"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" graft.Verify "$1" "$2"
