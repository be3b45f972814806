#!/bin/bash
# Three-SF bench sweep (sf0.1 testdata -> sf1/sf10 replicas) with the
# fixed pre-touched heap the artifacts' method line documents (a
# growable heap page-fault-storms this kernel mid-sweep). Produces
# /tmp/bench_sf{01,1,10}.json; assemble with tools/assemble_bench.py.
#
# Usage: tools/run_sweep.sh [repeats]
set -euo pipefail
cd "$(dirname "$0")/.."
REPEATS="${1:-2}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
run() { # name dir
  echo "=== sweep $1 ($2) repeats=$REPEATS"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_BENCH_FULL="/tmp/bench_$1.json" \
    java $OPENS -Xms48g -Xmx48g -XX:+AlwaysPreTouch \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "" "$REPEATS" | tail -1
}
run sf01 /root/testdata/sf0.1
run sf1  /root/repo/benchdata/sf1
run sf10 /root/repo/benchdata/sf10
echo "done: /tmp/bench_sf01.json /tmp/bench_sf1.json /tmp/bench_sf10.json"
