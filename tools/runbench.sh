#!/bin/bash
# Direct-java bench launcher (mirrors build.sbt javaOptions) so sbt isn't
# locked while a bench runs. Usage: runbench.sh [outfile]
cd /root/repo
OUT="${1:-/tmp/bench_quiet.log}"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# /opt/spark/jars bundles scala-library; append the sbt-boot copy too so
# the launcher also works on a Spark layout that does not (ADVICE r8: the
# lookup was computed but never added to CP — a silently dead fallback).
SCALA_LIB=$(ls ~/.sbt/boot/*/org.scala-lang/scala-library/*/scala-library*.jar 2>/dev/null | head -1)
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*${SCALA_LIB:+:$SCALA_LIB}"
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-48g} -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench > "$OUT" 2>&1
