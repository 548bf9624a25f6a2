#!/bin/bash
# r5 TPU session F: replaces the C2 tail + session E with one
# priority-ordered queue. Waits for the in-flight AdaGCL/netfilx quality
# run (PID in /tmp/r5_adagcl.pid), copies its artifacts, then:
#   1. short NEW-CODE retimes (MHRec bf16 slot messages; GRCN
#      plain-indexing revert) — these validate r5 code changes;
#   2. MHRec component bench (floor-analysis numbers, post-col-major);
#   3. GRCN step breakdown;
#   4. MMSSL/beauty quality re-measure (post r5 softmax-precedence fix);
#   5. LightGODE/sports 16-grid (weak #7);
#   6. mid-round bench artifact.
# Idempotent via .done markers. The driver's end-of-round bench.py run
# SIGSTOPs any still-running step here via /tmp/r5_queue.pid.
set -u
cd /root/repo
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if [ -f /tmp/r5_adagcl.pid ]; then
  while kill -0 "$(cat /tmp/r5_adagcl.pid)" 2>/dev/null; do sleep 60; done
fi
if ! step_done r5_adagcl_netfilx; then
  [ -f parity_logs/AdaGCL_netfilx.log ] && \
    cp parity_logs/AdaGCL_netfilx.log parity_logs/AdaGCL_netfilx.r5.log
  grep -q "Best performance" parity_logs/AdaGCL_netfilx.log 2>/dev/null \
    && mark_done r5_adagcl_netfilx
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

if ! step_done r5e_mhrec_bench; then
  echo "=== MHRec component bench start $(date +%H:%M:%S)"
  timeout 1800 python scripts/bench_mhrec.py \
    > parity_logs/MHRec_beauty.phaseC.bench_r5e.txt 2>&1
  rc=$?
  echo "=== MHRec bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5e_mhrec_bench
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

if ! step_done r5_mmssl_beauty; then
  echo "=== MMSSL beauty start $(date +%H:%M:%S)"
  timeout 5400 python scripts/run_combo.py --Model MMSSL \
    --data_path beauty --data_root /root/reference/Data \
    --log_dir parity_logs --num_epoch 1000 \
    --combo '{"G_rate": 0.0001, "learning_rate": 0.00055, "reg_weight": 0.00001, "ssl_alpha": 0.1, "ssl_temp": 0.5, "mm_layers": 2}' \
    > parity_logs/MMSSL_beauty.r5.stdout 2>&1
  rc=$?
  [ -f parity_logs/MMSSL_beauty.log ] && \
    cp parity_logs/MMSSL_beauty.log parity_logs/MMSSL_beauty.r5.log
  echo "=== MMSSL beauty exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_mmssl_beauty
fi

if ! step_done r5_lgode_grid; then
  echo "=== LightGODE sports 16-grid start $(date +%H:%M:%S)"
  mkdir -p /tmp/lgode_grid/Model_YAML /tmp/lgode_grid/log
  cat > /tmp/lgode_grid/Model_YAML/LightGODE.yaml <<'EOF'
gamma: [0.2, 0.5, 1.0, 2.0]
learning_rate: [0.001]
t: [0.5, 0.8, 1.0, 1.2]
hyper_parameters: ["gamma", "learning_rate", "t"]
EOF
  (cd /tmp/lgode_grid && timeout 5400 python /root/repo/main.py \
     --Model LightGODE --data_path sports \
     --data_root /root/reference/Data --num_epoch 1000)
  rc=$?
  cp /tmp/lgode_grid/log/LightGODE_sports.log \
     parity_logs/LightGODE_sports.grid16.log 2>/dev/null
  echo "=== LightGODE grid exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_lgode_grid
fi

if ! step_done r5d_bench; then
  echo "=== bench.py start $(date +%H:%M:%S)"
  CHAOREC_BENCH_NO_PAUSE=1 timeout 1800 python bench.py \
    > parity_logs/bench_r5_mid.txt 2>&1
  rc=$?
  echo "=== bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_bench
fi

echo "=== r5 TPU session F complete $(date +%H:%M:%S)"
