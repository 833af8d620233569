#!/bin/bash
# Alternating-level scaling reps with incremental logging.
# Usage: scaling_loop.sh <feed> <log> <reps-per-level>
FEED=$1; LOG=$2; REPS=${3:-4}
for i in $(seq 1 $REPS); do
  for lvl in 1 4; do
    TMPDIR=/dev/shm timeout 1800 python /root/repo/scripts/scaling_worker.py $lvl "$FEED" 2>/dev/null | tail -1 >> "$LOG"
  done
done
echo DONE >> "$LOG"
