#!/bin/bash
# Standalone bench runner: uses a snapshot of compiled classes so concurrent
# sbt compiles don't perturb a running benchmark. Replicates the driver's
# env (cpus=32, sf0.1, -Xmx8g) unless overridden.
set -e
REPO=/root/repo
SNAP=${BENCH_SNAP:-$REPO/target/bench-classes}
OUT=${SPARK_GRAFT_BENCH_OUT:-$REPO/BENCH_LOCAL.json}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_BENCH_OUT=$OUT
exec java $ADD_OPENS --add-modules jdk.incubator.vector \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench
