#!/bin/bash
# Round-4 third TPU session: re-times after the frozen-state scan
# restructure, plus the NGCF step breakdown. Chained via the queue lock.
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4c session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r4_speed_LATTICE2; then
  echo "=== LATTICE re-time start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model LATTICE \
    --data_path microlens --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
    > parity_logs/LATTICE_microlens.speed.stdout 2>&1
  rc=$?
  echo "=== LATTICE re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_speed_LATTICE2
fi

if ! step_done r4_speed_MICRO2; then
  echo "=== MICRO re-time start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model MICRO \
    --data_path microlens --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
    > parity_logs/MICRO_microlens.speed.stdout 2>&1
  rc=$?
  echo "=== MICRO re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_speed_MICRO2
fi

if ! step_done r4_breakdown_NGCF; then
  echo "=== NGCF breakdown start $(date +%H:%M:%S)"
  rm -rf /tmp/ngcf_prof_r4
  timeout 2400 python scripts/run_speed_single.py --Model NGCF \
    --data_path beauty --num_epoch 3 --data_root "$DATA" --log_dir /tmp \
    --profile_dir /tmp/ngcf_prof_r4 \
    > parity_logs/NGCF_beauty.trace.txt 2>&1
  rc=$?
  python scripts/summarize_trace.py /tmp/ngcf_prof_r4 40 \
    >> parity_logs/NGCF_beauty.trace.txt 2>&1 || true
  echo "=== NGCF breakdown exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_breakdown_NGCF
fi

python scripts/parity_speed_report.py > parity_logs/speed_report.txt 2>&1 || true
echo "=== R4C SESSION DONE $(date +%H:%M:%S)"
