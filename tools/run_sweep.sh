#!/bin/bash
# Three-SF bench sweep (sf0.1 testdata -> sf1/sf10 replicas) in ONE
# long-lived JVM (graft.BenchSweep) with the fixed pre-touched heap the
# artifacts' method line documents. One JVM because this guest's
# page-fault path intermittently degrades ~100x under host-side memory
# pressure (measured r14: 8 GiB pre-touch = 7 CPU-min sys, zero
# guest-visible steal) — per-leg heap re-allocation contaminated whole
# legs, while already-resident memory runs at full speed. The per-leg
# calibration probes (calib_sec / calib_end_sec in each record) are the
# degradation tripwire; a leg past SPARK_GRAFT_CALIB_LIMIT (default
# 10 s) self-reports coload.flagged=true.
#
# Produces /tmp/bench_sf{01,1,10}.json; assemble with
# tools/assemble_bench.py.
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
java $OPENS -Xms48g -Xmx48g -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.BenchSweep "$REPEATS" \
  /root/testdata/sf0.1:/tmp/bench_sf01.json \
  /root/repo/benchdata/sf1:/tmp/bench_sf1.json \
  /root/repo/benchdata/sf10:/tmp/bench_sf10.json
echo "done: /tmp/bench_sf01.json /tmp/bench_sf1.json /tmp/bench_sf10.json"
