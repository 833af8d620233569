#!/bin/bash
# Round-4 scaling evidence: uniform ×512 control pair (post-r4 engine)
# + skewed-feed (10% hot key) alternating pairs, feeds on tmpfs.
# Usage: skew_scaling_run.sh [skew_reps=2]
set -e
REPS=${1:-2}
export TMPDIR=/dev/shm
cd /root/repo
echo "[$(date +%T)] preparing x128 feed" >&2
F128=$(python -c "
import sys; sys.path[:0]=['/root/repo','/root/repo/scripts']
import scaling_bench as s
print(s.prepare_feed(128))" 2>/dev/null | tail -1)
echo "[$(date +%T)] x128 at $F128; amplifying x4" >&2
F512=/dev/shm/kcjfs_feed512
SKEW=/dev/shm/kcjfs_feed512_skew
python scripts/amplify_feed.py "$F128" "$F512" 4 2>/dev/null | tail -1 >&2
rm -rf "$F128"
echo "[$(date +%T)] skewing" >&2
python scripts/skew_feed.py "$F512" "$SKEW" 10 1024 2>/dev/null | tail -1 | tee -a scaling_r04_skew.log >&2
echo "[$(date +%T)] uniform control pair" >&2
for lvl in 1 4; do
  TMPDIR=/dev/shm timeout 1800 python scripts/scaling_worker.py $lvl "$F512" 2>/dev/null | tail -1 >> scaling_r04_uniform.log
done
rm -rf "$F512"
echo "[$(date +%T)] skewed alternating reps" >&2
bash scripts/scaling_loop.sh "$SKEW" scaling_r04_skew.log "$REPS"
rm -rf "$SKEW"
echo "[$(date +%T)] done" >&2
