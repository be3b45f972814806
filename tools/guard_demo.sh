#!/bin/bash
# Mid-leg blind-window demo (VERDICT r14 ask #2): run a short bench leg
# and INDUCE a degradation strictly BETWEEN the start and end
# calibration probes, proving the new interleaved mid-leg probes flip
# coload.flagged=true while both end probes read healthy — the exact
# contamination shape that r14's start/end-only guard was blind to
# (BENCH_r14: calib 5.5 -> 2.7 s around a uniformly 1.69x sweep).
#
# The induced load is NON-java CPU contention (shell spinners), so the
# foreign-JVM meter and the steal meter both stay clean — only the
# mid-leg probes can see it, which is the point.
#
# Usage: tools/guard_demo.sh <outJson> [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:?usage: guard_demo.sh <outJson> [sfDir]}"
SF="${2:-/root/testdata/sf0.01}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
LOG="$(mktemp /tmp/guard_demo_log.XXXX)"

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_FULL="$OUT" \
SPARK_GRAFT_RECALL=off \
java $OPENS -Xms8g -Xmx8g -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench "" 1 >"$LOG" 2>&1 &
BENCH_PID=$!

# wait for the START probe to finish (it logs its time), then give the
# sweep a moment to get into the early families
until grep -q "calibration probe:" "$LOG" 2>/dev/null; do
  sleep 1
  kill -0 "$BENCH_PID" 2>/dev/null || { cat "$LOG"; exit 1; }
done
sleep 8

# induce: 4x-oversubscribed non-java CPU spinners for ~45 s
echo "[demo] starting spinners"
SPIN_PIDS=()
for i in $(seq 1 128); do
  (end=$((SECONDS + 45)); while [ $SECONDS -lt $end ]; do :; done) &
  SPIN_PIDS+=($!)
done
sleep 45
for p in "${SPIN_PIDS[@]}"; do kill "$p" 2>/dev/null || true; done
wait "${SPIN_PIDS[@]}" 2>/dev/null || true
echo "[demo] spinners stopped; waiting for the leg to finish"

wait "$BENCH_PID"
echo "[demo] bench done; guard stamps:"
grep -E "calibration probe|mid-leg probe|WARNING" "$LOG" | tail -20
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
mid = d.get("calib_mid", {})
print("calib_sec", d["calib_sec"], "calib_end_sec", d["calib_end_sec"])
print("calib_mid_limit", d.get("calib_mid_limit"))
print("mid probes:", json.dumps(mid))
print("flagged:", d["coload"]["flagged"])
EOF
