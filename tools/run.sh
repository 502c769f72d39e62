#!/bin/bash
# Fast local runner: java against sbt-compiled classes + /opt/spark/jars.
# Usage: tools/run.sh <mainClass> [args...]   (e.g. graft.Verify /root/testdata/sf0.001 /tmp/out)
set -e
# Needed by SPARK_GRAFT_MASTER=local-cluster[...]: the worker builds executor
# java commands from the distribution. Harmless for local[n] — a plain
# SparkConf never reads spark-defaults.conf (only spark-submit does).
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
# load-spark-env.sh normally sets this; without it the executor command
# builder probes dev-build directories and fails ("Cannot find any build
# directories") when the in-process Worker launches executor JVMs.
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
# resources appended explicitly: `sbt compile` alone does not copy
# src/main/resources (META-INF/services DSv2 registration) into classes,
# so a fresh target would otherwise lose the graft-kv/graft-logs lookup
CLS=target/scala-2.13/classes:src/main/resources
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLS:/opt/spark/jars/*" "$MAIN" "$@"
