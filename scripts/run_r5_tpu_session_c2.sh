#!/bin/bash
# r5 TPU session C2: reordered continuation after stopping C/D mid-flight.
# Short NEW-CODE evidence runs first (the 06:xx GRCN retimes measured the
# pre-527584a code; MHRec full pipeline has no post-f32625b row), then the
# multi-hour quality tail, then bench. Idempotent via .done markers; the
# stale old-code GRCN markers are superseded by r5c2_* names.
set -u
cd /root/repo
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

# ---- short new-code evidence
if ! step_done r5c2_grcn_netfilx; then
  echo "=== GRCN netfilx re-time (scatter-free attn) start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model GRCN \
    --data_path netfilx --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_netfilx.speed_r5c2.stdout 2>&1
  rc=$?
  echo "=== GRCN netfilx exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5c2_grcn_netfilx
fi

if ! step_done r5c2_grcn_beauty; then
  echo "=== GRCN beauty re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model GRCN \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_beauty.speed_r5c2.stdout 2>&1
  rc=$?
  echo "=== GRCN beauty exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5c2_grcn_beauty
fi

if ! step_done r5c2_mhrec_full; then
  echo "=== MHRec beauty FULL re-time (column-major) start $(date +%H:%M:%S)"
  timeout 3600 python scripts/run_speed_single.py --Model MHRec \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/MHRec_beauty.full.speed_r5c2.stdout 2>&1
  rc=$?
  echo "=== MHRec full exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5c2_mhrec_full
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

# ---- multi-hour quality runs, priority order
if ! step_done r5_grade_sports; then
  echo "=== Grade sports quality start $(date +%H:%M:%S)"
  timeout 9000 python scripts/run_combo.py --Model Grade \
    --data_path sports --data_root /root/reference/Data \
    --log_dir parity_logs --num_epoch 1000 \
    --combo '{"n_layers": 5, "learning_rate": 0.001, "reg_weight": 0.1, "ssl_alpha": 0.2, "ssl_temp": 0.3, "ssl_temp2": 0.3, "noise_alpha": 0.2}' \
    > parity_logs/Grade_sports.r5.stdout 2>&1
  rc=$?
  [ -f parity_logs/Grade_sports.log ] && \
    cp parity_logs/Grade_sports.log parity_logs/Grade_sports.r5.log
  echo "=== Grade sports exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_grade_sports
fi

if ! step_done r5_adagcl_netfilx; then
  echo "=== AdaGCL netfilx quality start $(date +%H:%M:%S)"
  timeout 9000 python scripts/run_combo.py --Model AdaGCL \
    --data_path netfilx --data_root /root/reference/Data \
    --log_dir parity_logs --num_epoch 1000 \
    --combo '{"n_layers": 2, "learning_rate": 0.001, "reg_weight": 0.1, "ssl_alpha": 0.2, "ssl_temp": 0.5}' \
    > parity_logs/AdaGCL_netfilx.r5.stdout 2>&1
  rc=$?
  [ -f parity_logs/AdaGCL_netfilx.log ] && \
    cp parity_logs/AdaGCL_netfilx.log parity_logs/AdaGCL_netfilx.r5.log
  echo "=== AdaGCL netfilx exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_adagcl_netfilx
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

if ! step_done r5d_bench; then
  echo "=== bench.py start $(date +%H:%M:%S)"
  CHAOREC_BENCH_NO_PAUSE=1 timeout 1800 python bench.py \
    > parity_logs/bench_r5_mid.txt 2>&1
  rc=$?
  echo "=== bench exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5d_bench
fi

echo "=== r5 TPU session C2 complete $(date +%H:%M:%S)"
