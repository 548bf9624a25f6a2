#!/bin/bash
# Round-4 sixth TPU session: re-validate MMSSL after the csr_norm
# rowsum^-0.5 fix (xfw trajectory pair + beauty speed re-time).
# Chained behind the r4e lock holder via blocking flock; idempotent.
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4f session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r4f_xfw_MMSSL3; then
  echo "=== xfw MMSSL ours (csr_norm fix) start $(date +%H:%M:%S)"
  timeout 2400 python scripts/xfw_oracle.py --Model MMSSL --data_path baby \
      --num_epoch 6 --ours-only > /tmp/xfw_mmssl3_tpu.log 2>&1
  rc=$?
  echo "=== xfw MMSSL ours exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4f_xfw_MMSSL3
fi

if ! step_done r4f_speed_MMSSL3; then
  echo "=== MMSSL re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model MMSSL \
      --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
      > parity_logs/MMSSL_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== MMSSL re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4f_speed_MMSSL3
fi

python scripts/parity_speed_report.py > parity_logs/speed_report.txt 2>&1 || true
python scripts/parity_quality_report.py > parity_logs/quality_report.txt 2>&1 || true
echo "=== R4F SESSION DONE $(date +%H:%M:%S)"
