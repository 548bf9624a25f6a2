#!/bin/bash
# r5 TPU session E: post-C2 short evidence runs.
# 1. MHRec beauty FULL retime — first row with the bf16 hyper-attn
#    slot-message path (rides the graph_compute_dtype=bfloat16 default).
# 2. MHRec component bench refresh (floor-analysis numbers).
# 3. GRCN netfilx step breakdown (profile_model) for the 0.64x row.
# Idempotent via .done markers; waits for the C2 queue to drain first.
set -u
cd /root/repo
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if [ -f /tmp/r5_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do sleep 60; done
fi

if ! step_done r5e_mhrec_bf16_full; then
  echo "=== MHRec beauty FULL retime (bf16 slot messages) start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model MHRec \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/MHRec_beauty.full.speed_r5e.stdout 2>&1
  rc=$?
  echo "=== MHRec full exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_mhrec_bf16_full
fi

if ! step_done r5e_mhrec_bench; then
  echo "=== MHRec component bench start $(date +%H:%M:%S)"
  timeout 1800 python scripts/bench_mhrec.py \
    > parity_logs/MHRec_beauty.phaseC.bench_r5e.txt 2>&1
  rc=$?
  echo "=== MHRec bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_mhrec_bench
fi

if ! step_done r5e_grcn_netfilx_revert; then
  echo "=== GRCN netfilx retime (plain-indexing revert) start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model GRCN \
    --data_path netfilx --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_netfilx.speed_r5e.stdout 2>&1
  rc=$?
  echo "=== GRCN netfilx exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_grcn_netfilx_revert
fi

if ! step_done r5e_grcn_beauty_revert; then
  echo "=== GRCN beauty retime (plain-indexing revert) start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model GRCN \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_beauty.speed_r5e.stdout 2>&1
  rc=$?
  echo "=== GRCN beauty exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_grcn_beauty_revert
fi

if ! step_done r5e_grcn_breakdown; then
  echo "=== GRCN netfilx breakdown start $(date +%H:%M:%S)"
  timeout 2400 python scripts/profile_model.py --Model GRCN \
    --data_path netfilx --data_root /root/reference/Data \
    > parity_logs/GRCN_netfilx.profile_r5e.txt 2>&1
  rc=$?
  echo "=== GRCN breakdown exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_grcn_breakdown
fi

echo "=== r5 TPU session E complete $(date +%H:%M:%S)"
