#!/bin/bash
# r5 TPU session phase D: follow-ons discovered while phase C ran.
#   1. kernel re-audit with the CORRECTED row-Adam reference (the first
#      r5 artifact reported a false FAIL from a touched-rows-only ref)
#   2. on-chip row-Adam bisection probe (closes the audit loop with a
#      real-TPU artifact)
#   3. LATTICE netfilx retime - disambiguates the microlens 4.15->7.8 s
#      shift (netfilx had a 1.02 s r4 row; if it also ~doubled, the
#      cause is a slower tunnel/chip today, not the row-mode commit)
#   4. LATTICE microlens retime #2 under a quieter host
#   5. bench.py on the real chip (end-of-round contract check)
# Waits for the phase-C runner to exit. Idempotent via .done/r5d_*.
set -u
cd /root/repo
if [ -f /tmp/r5_queue.pid ]; then
  C_PID=$(head -1 /tmp/r5_queue.pid)
  while kill -0 "$C_PID" 2>/dev/null; do sleep 60; done
fi
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r5d_kernel_reaudit2; then
  echo "=== kernel reaudit (corrected ref) start $(date +%H:%M:%S)"
  timeout 2400 python scripts/reaudit_kernels.py
  rc=$?
  echo "=== kernel reaudit exit $rc $(date +%H:%M:%S)"
  [ -f parity_logs/kernel_reaudit_r5.txt ] && \
    cp parity_logs/kernel_reaudit_r5.txt parity_logs/kernel_reaudit_r5b.txt
  [ $rc -eq 0 ] && mark_done r5d_kernel_reaudit2
fi

if ! step_done r5d_row_adam_probe; then
  echo "=== row-adam on-chip probe start $(date +%H:%M:%S)"
  timeout 1800 python scripts/probe_row_adam.py \
    > parity_logs/row_adam_probe_tpu.txt 2>&1
  rc=$?
  echo "=== row-adam probe exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_row_adam_probe
fi

if ! step_done r5d_lattice_netfilx; then
  echo "=== LATTICE netfilx re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model LATTICE \
    --data_path netfilx --num_epoch 6 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/LATTICE_netfilx.speed_r5.stdout 2>&1
  rc=$?
  echo "=== LATTICE netfilx exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_lattice_netfilx
fi

if ! step_done r5d_lattice_microlens2; then
  echo "=== LATTICE microlens re-time #2 start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model LATTICE \
    --data_path microlens --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/LATTICE_microlens.speed_r5b.stdout 2>&1
  rc=$?
  echo "=== LATTICE microlens #2 exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_lattice_microlens2
fi

if ! step_done r5d_bench; then
  echo "=== bench.py start $(date +%H:%M:%S)"
  CHAOREC_BENCH_NO_PAUSE=1 timeout 1800 python bench.py \
    > parity_logs/bench_r5_mid.txt 2>&1
  rc=$?
  echo "=== bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_bench
fi

echo "=== r5 TPU session D complete $(date +%H:%M:%S)"
