#!/bin/bash
# Healthy-window watch (r19 verdict item 2): the calibm <= ~0.026
# window the 20 r18 + 3 r19 pending denominators need never appeared
# while a human was watching — so a loop watches. Probes the host
# every ~150 s with graft.HostProbe (the bench's own min-of-two
# calib instruments, no SparkSession, ~8 s each); when TWO consecutive
# probes read healthy (calib1 <= 0.30 AND calibm <= 0.026 — baseline
# 0.285 / 0.024), fires ONE full re-record attempt:
#   SPARK_GRAFT_BENCH_ALL=1 graft.Bench  ->  tools/make_baseline.py
# make_baseline keeps its own refusal gates (>= 2 healthy sweeps, no
# degraded sweeps, full catalog timed), so a window that sours mid-run
# can NOT overwrite the baseline — the artifact is saved as
# HEALTHY_WINDOW_CANDIDATE.json either way and the loop resumes
# (max 3 fire attempts, then exits and leaves the candidates).
#
# Usage: nohup tools/healthy_watch.sh >/dev/null 2>&1 &
cd "$(dirname "$0")/.." || exit 1
LOG=healthy_watch.log
attempts=0
consec=0
echo "$(date -u +%F' '%T) watch started (thresholds c1<=0.30 cm<=0.026)" >> "$LOG"
while true; do
  # 8g heap (r21): at 2g the probe's 512 MB of bandwidth arrays GC-
  # thrash and calibm over-reads ~2x — part of the fresh-JVM bias that
  # kept the r20 watch from ever firing (see HostProbe scaladoc)
  out=$(SPARK_DRIVER_MEM=8g tools/run_main.sh graft.HostProbe 2>/dev/null | tail -1)
  c1=$(echo "$out" | grep -o 'calib1=[0-9.]*' | cut -d= -f2)
  cm=$(echo "$out" | grep -o 'calibm=[0-9.]*' | cut -d= -f2)
  if [ -n "$c1" ] && [ -n "$cm" ] && \
     awk "BEGIN{exit !($c1 <= 0.30 && $cm <= 0.026)}"; then
    consec=$((consec+1))
  else
    consec=0
  fi
  echo "$(date -u +%F' '%T) $out consec=$consec" >> "$LOG"
  if [ "$consec" -ge 2 ]; then
    attempts=$((attempts+1))
    echo "$(date -u +%F' '%T) WINDOW DETECTED (attempt $attempts): firing BENCH_ALL" >> "$LOG"
    # r20 ADVICE: a Bench that dies before writing bench_out.json must
    # not let a STALE artifact from an earlier run masquerade as the
    # healthy-window re-record — remove it first and require the file
    # to be newer than the launch.
    launch_ts=$(date +%s)
    rm -f bench_out.json
    SPARK_GRAFT_BENCH_ALL=1 SPARK_GRAFT_BENCH_BUDGET_SEC=1200 \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      tools/run_main.sh graft.Bench >> "$LOG" 2>&1
    if [ ! -f bench_out.json ] || \
       [ "$(stat -c %Y bench_out.json 2>/dev/null || echo 0)" -lt "$launch_ts" ]; then
      echo "$(date -u +%F' '%T) Bench left no fresh bench_out.json; skipping record" >> "$LOG"
      [ "$attempts" -ge 3 ] && exit 0
      consec=0
      continue
    fi
    cp bench_out.json HEALTHY_WINDOW_CANDIDATE.json
    python3 - <<'EOF' >> "$LOG" 2>&1
import json
b = json.load(open("BASELINE_BENCH.json"))
json.dump(sorted(b["core"]), open("/tmp/graft_core.json", "w"))
EOF
    if python3 tools/make_baseline.py HEALTHY_WINDOW_CANDIDATE.json \
         /tmp/graft_core.json \
         "r21 healthy-window auto re-record (healthy_watch.sh)" >> "$LOG" 2>&1; then
      echo "$(date -u +%F' '%T) BASELINE_BENCH.json RE-RECORDED" >> "$LOG"
      exit 0
    fi
    echo "$(date -u +%F' '%T) make_baseline refused; candidate saved" >> "$LOG"
    [ "$attempts" -ge 3 ] && exit 0
    consec=0
  fi
  sleep 150
done
