#!/bin/bash
# TPU-tunnel watchdog: poll the axon relay; the moment the backend is
# usable again, (re)launch the evidence queue. The queue is IDEMPOTENT
# (per-step markers under parity_logs/.done/), so a relaunch after a
# mid-queue flap only re-runs the steps whose artifacts are missing; the
# watchdog keeps re-arming until the queue's ALL sentinel exists — a
# single flap can no longer end the watch (round-2's "run once then
# break" lost the 08-17 window's phase-3 tail this way).
#
# A copy of this runs from /tmp in the live session; this tracked
# version is the restart recipe:
#   nohup bash scripts/tpu_watchdog.sh > /tmp/watchdog.log 2>&1 &
#   echo $! > /tmp/watchdog.pid
cd /root/repo
while [ ! -f parity_logs/.done/ALL ]; do
  # A live queue instance means the tunnel is fine — do NOT spin up a
  # probe client against the relay every loop iteration (each probe is
  # a fresh TPU client init contending with the queue's own work).
  if ! flock -n /tmp/quality_r2.lock true 2>/dev/null; then
    sleep 120
    continue
  fi
  if timeout 330 python -c "
from chaorec_tpu.elastic import probe_backend
p = probe_backend(300)
raise SystemExit(0 if p not in (None, 'cpu') else 1)"; then
    echo "$(date +%H:%M:%S) tunnel back - launching quality queue"
    bash /root/repo/scripts/run_quality_r2.sh >> /tmp/quality_r2.log 2>&1
    echo "$(date +%H:%M:%S) queue pass finished"
  else
    sleep 60
  fi
done
echo "$(date +%H:%M:%S) ALL evidence captured - watchdog exiting"
