#!/usr/bin/env bash
# Quiet-box anchor reading — the BENCH_r08a recipe, scripted.
#
# Launches graft.Bench via a DIRECT `java -cp` invocation (no sbt JVM
# inflating the pre-run loadavg) so Bench's own `loadavg_start`
# reflects the actual box state. The round-7/8/9 anchor-band asks all
# want a <0.3-loadavg reading; check `uptime` first and let the box
# settle ~5 min after any sbt run.
#
#   TAG=r10_quiet tools/bench_quiet.sh            # full catalog, sf0.1
#   SPARK_GRAFT_SF_DIR=/tmp/sf1 TAG=... tools/bench_quiet.sh
#
# Requires an up-to-date `sbt compile` (it runs the classes directly).
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${TAG:-quiet}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CLASSES="target/scala-2.13/classes"
[ -d "$CLASSES/graft" ] || { echo "no compiled classes — run sbt compile first" >&2; exit 1; }

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "loadavg at launch: $(cut -d' ' -f1-3 /proc/loadavg)"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  | grep '"metric"' > "BENCH_${TAG}.json"
tail -c 200 "BENCH_${TAG}.json"; echo
