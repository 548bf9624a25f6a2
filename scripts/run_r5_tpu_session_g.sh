#!/bin/bash
# r5 TPU session G: runs after session F drains. Phase-C-only MHRec
# retime with the bf16 slot-message path (the reference's
# log/MHRec_beauty.log workload — see the measurement-mode note in
# models/mhrec.py), the headline row for VERDICT r4 missing #4.
set -u
cd /root/repo
DONE=parity_logs/.done
mkdir -p "$DONE"
if [ -f /tmp/r5_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do sleep 60; done
fi
if [ ! -f "$DONE/r5g_mhrec_phasec_bf16" ]; then
  echo "=== MHRec phase-C retime (bf16 slots) start $(date +%H:%M:%S)"
  CHAOREC_MHREC_PHASE_C_ONLY=1 timeout 2400 \
    python scripts/run_speed_single.py --Model MHRec \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/MHRec_beauty.phaseC.speed_r5g.stdout 2>&1
  rc=$?
  echo "=== MHRec phase-C exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo "ok $(date +%F_%H:%M:%S)" > "$DONE/r5g_mhrec_phasec_bf16"
fi
echo "=== r5 TPU session G complete $(date +%H:%M:%S)"

if [ ! -f "$DONE/r5g_lattice_microlens" ]; then
  echo "=== LATTICE microlens clean retime start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model LATTICE \
    --data_path microlens --num_epoch 6 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/LATTICE_microlens.speed_r5g.stdout 2>&1
  rc=$?
  echo "=== LATTICE microlens exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo "ok $(date +%F_%H:%M:%S)" > "$DONE/r5g_lattice_microlens"
fi
echo "=== r5 TPU session G tail complete $(date +%H:%M:%S)"

if [ ! -f "$DONE/r5g_grcn_unpacked_ab" ]; then
  echo "=== GRCN netfilx A/B control (CHAOREC_GRCN_PACKED=0) start $(date +%H:%M:%S)"
  CHAOREC_GRCN_PACKED=0 timeout 3000 python scripts/run_speed_single.py \
    --Model GRCN --data_path netfilx --num_epoch 8 \
    --data_root /root/reference/Data --log_dir /tmp \
    > parity_logs/GRCN_netfilx.speed_r5g_unpacked.stdout 2>&1
  rc=$?
  echo "=== GRCN A/B control exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo "ok $(date +%F_%H:%M:%S)" > "$DONE/r5g_grcn_unpacked_ab"
fi
echo "=== r5 TPU session G tail2 complete $(date +%H:%M:%S)"

if [ ! -f "$DONE/r5g_mhrec_bench" ]; then
  echo "=== MHRec component bench (fixed args) start $(date +%H:%M:%S)"
  timeout 1800 python scripts/bench_mhrec.py --data_path beauty \
    --data_root /root/reference/Data \
    > parity_logs/MHRec_beauty.phaseC.bench_r5e.txt 2>&1
  rc=$?
  echo "=== MHRec bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo "ok $(date +%F_%H:%M:%S)" > "$DONE/r5g_mhrec_bench"
fi
echo "=== r5 TPU session G tail3 complete $(date +%H:%M:%S)"
