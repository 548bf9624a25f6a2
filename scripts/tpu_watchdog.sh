#!/bin/bash
# TPU-tunnel watchdog: poll the axon relay; the moment the backend is
# usable again, launch the queued quality/speed runs (which are
# themselves supervised + checkpointed via chaorec_tpu/elastic.py, so a
# second flap mid-queue only costs a relaunch, not the run).
#
# A copy of this runs from /tmp in the live session (started round 2);
# this tracked version is the restart recipe:
#   nohup bash scripts/tpu_watchdog.sh > /tmp/watchdog.log 2>&1 &
cd /root/repo
while true; do
  if timeout 330 python -c "
from chaorec_tpu.elastic import probe_backend
p = probe_backend(300)
raise SystemExit(0 if p not in (None, 'cpu') else 1)"; then
    echo "$(date +%H:%M:%S) tunnel back - launching quality queue"
    bash /root/repo/scripts/run_quality_r2.sh > /tmp/quality_r2.log 2>&1
    echo "$(date +%H:%M:%S) queue done"
    break
  fi
  sleep 60
done
