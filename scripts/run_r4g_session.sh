#!/bin/bash
# Round-4 seventh TPU session: bisect the Grade/sports + AdaGCL/netfilx
# worker crash between (a) pipelined epoch+eval co-residency and (b) the
# orbax checkpoint manager, using the new probe components. Chained
# behind r4f via blocking flock; idempotent.
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4g session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r4g_probe_grade3; then
  for c in epoch_eval run2; do
    echo "=== probe3 $c start $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    timeout 2400 python scripts/probe_grade_crash.py --Model Grade \
        --data_path sports --data_root "$DATA" --component "$c" \
        >> parity_logs/grade_crash_probe.txt 2>&1
    rc=$?
    echo "=== probe3 $c exit rc=$rc $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    [ $rc -ne 0 ] && sleep 90
  done
  mark_done r4g_probe_grade3
fi

echo "=== R4G SESSION DONE $(date +%H:%M:%S)"
