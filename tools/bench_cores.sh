#!/usr/bin/env bash
# Core-scaling reading: one Bench invocation at an explicit core count
# (bench_quiet.sh pins 32; this is the 8-vs-32 ratio probe —
# SCALING.md "SCALING_r17"). Same direct-java recipe, same JSON line.
#
#   SPARK_GRAFT_SF_DIR=/tmp/sf1 CPUS=8 TAG=sf1_c8 \
#     SPARK_GRAFT_ONLY=q_a,q_b tools/bench_cores.sh
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${TAG:-cores}"
CPUS="${CPUS:-32}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CLASSES="target/scala-2.13/classes"
[ -d "$CLASSES/graft" ] || { echo "no compiled classes — run sbt compile first" >&2; exit 1; }

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "loadavg at launch: $(cut -d' ' -f1-3 /proc/loadavg)  cpus=$CPUS"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  | grep '"metric"' > "BENCH_${TAG}.json"
tail -c 200 "BENCH_${TAG}.json"; echo
