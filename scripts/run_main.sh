#!/usr/bin/env bash
# Run a graft main class directly on the JVM — no sbt launch overhead
# (sbt adds ~20 s per invocation; measurement runs also want the
# leanest possible harness around the timed code).
#
# Usage:
#   scripts/run_main.sh graft.Bench                  # full bench
#   SPARK_GRAFT_BENCH_ONLY=q01_filter_project \
#     scripts/run_main.sh graft.Bench                # subset
#   scripts/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#
# Compile first: sbt -batch compile. Heap via GRAFT_XMX (default 48g).
# The --add-opens list is what Spark 4 needs on Java 17 (same set
# spark-submit injects); without it Platform/Unsafe initialization
# fails at session start.
set -euo pipefail
cd "$(dirname "$0")/.."

MAIN="${1:?usage: run_main.sh <mainClass> [args...]}"
shift
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"
exec java -Xmx"${GRAFT_XMX:-48g}" -cp "$CP" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  "$MAIN" "$@"
