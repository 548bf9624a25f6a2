#!/bin/bash
# r5: bisect the Grade/sports TPU-worker crash (VERDICT r4 next #1).
# scan2 passed fetch-synced; full epoch crashes. Ladder the batch count,
# then ablate the three loss steps at the crashing count.
set -u
cd /root/repo
LOG=parity_logs/grade_crash_probe5.txt
run() {
  local tag="$1"; shift
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout 1500 "$@" >> "$LOG" 2>&1
  echo "=== $tag exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}
P="python scripts/probe_grade_crash.py --Model Grade --data_path sports --data_root /root/reference/Data --component"
for N in scan155 scan78 scan20; do
  run "$N-all" $P "$N"
done
for L in l1 bpr gen; do
  PROBE_LOSSES=$L run "scan155-$L" $P scan155
done
echo "=== bisect pass done $(date +%H:%M:%S)" | tee -a "$LOG"
