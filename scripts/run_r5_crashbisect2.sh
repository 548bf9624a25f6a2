#!/bin/bash
# r5 crash bisect phase 2: execution-time measurement + chunked-epoch
# workaround test (per-program execution budget hypothesis).
set -u
cd /root/repo
if [ -f /tmp/crashbisect.pid ]; then
  while kill -0 "$(cat /tmp/crashbisect.pid)" 2>/dev/null; do sleep 20; done
fi
LOG=parity_logs/grade_crash_probe5.txt
run() {
  local tag="$1"; shift
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== $tag exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}
P="python scripts/probe_grade_crash.py --Model Grade --data_path sports --data_root /root/reference/Data --component"
# exec time of the passing 78-batch scan (second call = no compile)
PROBE_TIME2=1 run "time-scan78" $P scan78
# chunked full epoch: 5 x 31-batch programs, carry on device
PROBE_CHUNK=31 run "chunk31-scan155" $P scan155
echo "=== bisect phase 2 done $(date +%H:%M:%S)" | tee -a "$LOG"
