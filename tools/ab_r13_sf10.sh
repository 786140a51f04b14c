#!/bin/bash
# r13 interleaved sf10 A/B: judged r12 tree (worktree at b049605) vs
# this tree, single-key isolated sessions via tools/scale_report.py
# (SCALE_QUERIES=<key>, warm second-run timing, 24g driver heap — the
# r12 "isolated" protocol), alternating trees per rep so box drift
# cannot masquerade as a code delta. Usage:
#   bash tools/ab_r13_sf10.sh <key> <reps> [sf_dir]
# Appends one line per rep to /root/repo/evidence/ab_r13_sf10.log.
set -u
KEY="$1"; REPS="${2:-2}"; SFD="${3:-/root/repo/scale_data/sf10}"
LOG=/root/repo/evidence/ab_r13_sf10.log
for i in $(seq 1 "$REPS"); do
  for TREE in /root/wt_r12 /root/repo; do
    T0=$(date +%s)
    OUT=$(cd "$TREE" && SCALE_QUERIES="$KEY" SPARK_GRAFT_DRIVER_MEM=24g \
          python tools/scale_report.py "$SFD" 2>/dev/null | tail -1)
    T1=$(date +%s)
    echo "$(date -u +%H:%M:%S) rep=$i tree=$TREE key=$KEY wall=$((T1-T0))s $OUT" | tee -a "$LOG"
  done
done
