#!/bin/bash
# Round-5 serialized TPU session. TPU work must be strictly serialized:
# the Grade/AdaGCL crash probes kill the worker process, which would
# take down any co-running client. Idempotent via parity_logs/.done/r5_*.
# Short evidence runs first, multi-hour quality runs last.
set -u
cd /root/repo
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

# wait for the crash bisect phases (if running)
for pf in /tmp/crashbisect.pid /tmp/crashbisect2.pid; do
  if [ -f "$pf" ]; then
    while kill -0 "$(cat "$pf")" 2>/dev/null; do sleep 30; done
  fi
done

# ---- 1. Pallas kernel re-audit (VERDICT weak #2: false-OK trap)
if ! step_done r5_kernel_reaudit; then
  echo "=== kernel reaudit start $(date +%H:%M:%S)"
  timeout 2400 python scripts/reaudit_kernels.py
  rc=$?
  echo "=== kernel reaudit exit $rc $(date +%H:%M:%S)"
  [ -f parity_logs/kernel_reaudit_r5.txt ] && mark_done r5_kernel_reaudit "rc=$rc"
fi

# ---- 2. GRCN re-times post EllPattern rewrite (VERDICT next #5)
if ! step_done r5_grcn_beauty; then
  echo "=== GRCN beauty re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model GRCN \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== GRCN beauty exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_grcn_beauty
fi
if ! step_done r5_grcn_netfilx; then
  echo "=== GRCN netfilx re-time start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model GRCN \
    --data_path netfilx --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/GRCN_netfilx.speed.stdout 2>&1
  rc=$?
  echo "=== GRCN netfilx exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_grcn_netfilx
fi

# ---- 3. MHRec attention micro-op decomposition (VERDICT next #4)
if ! step_done r5_mhrec_micro; then
  echo "=== MHRec micro bench start $(date +%H:%M:%S)"
  timeout 2400 python scripts/bench_mhrec.py --data_path beauty \
    --data_root /root/reference/Data \
    > parity_logs/MHRec_beauty.phaseC.bench_r5.txt 2>&1
  rc=$?
  echo "=== MHRec micro exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_mhrec_micro
fi

# ---- 4. LightGODE sports: the reference's ACTUAL 16-combo grid
# (log/LightGODE_sports.log ran gamma{0.2,0.5,1,2} x t{0.5,0.8,1.0,1.2},
# NOT the shipped YAML). Its 0.09804 is the grid-best (gamma=0.2, t=0.8,
# 360 epochs); the t=1.0 sibling scored 0.09346 ~= our single-combo
# 0.09342. Grid-best vs grid-best is the honest comparison.
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

# ---- 5. MMSSL beauty quality re-run (post real-data-softmax fix;
# r4 row was -14.5% vs ref 0.13361)
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
echo "=== r5 TPU session complete $(date +%H:%M:%S)"

# ---- 6. FKAN_GCF clothing profile (straggler: 1.18x, no floor analysis)
if ! step_done r5_fkan_profile; then
  echo "=== FKAN profile start $(date +%H:%M:%S)"
  timeout 2400 python scripts/profile_model.py --Model FKAN_GCF \
    --data_path clothing --data_root /root/reference/Data \
    > parity_logs/FKAN_GCF_clothing.profile_r5.txt 2>&1
  rc=$?
  echo "=== FKAN profile exit $rc $(date +%H:%M:%S)"
  [ -f parity_logs/FKAN_GCF_clothing.profile_r5.txt ] && mark_done r5_fkan_profile "rc=$rc"
fi

# ---- 7. The two crash-blocked quality rows, now on chunked dispatch
# (Grade/sports vs ref 0.06959; AdaGCL/netfilx vs ref 0.21549).
if ! step_done r5_grade_sports; then
  echo "=== Grade sports quality start $(date +%H:%M:%S)"
  timeout 10800 python scripts/run_combo.py --Model Grade \
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
  timeout 10800 python scripts/run_combo.py --Model AdaGCL \
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

# ---- 8. kernel re-audit take 2 (row_adam at production D=384; scan
# timing with more iters) — marker was cleared after the D-guard fix
if ! step_done r5_kernel_reaudit; then
  echo "=== kernel reaudit(2) start $(date +%H:%M:%S)"
  timeout 2400 python scripts/reaudit_kernels.py
  rc=$?
  echo "=== kernel reaudit(2) exit $rc $(date +%H:%M:%S)"
  [ -f parity_logs/kernel_reaudit_r5.txt ] && mark_done r5_kernel_reaudit "rc=$rc"
fi

# ---- 9. GRCN netfilx profile (still 0.71x post-EllPattern: find the
# dominant op — suspects: (R,K,D) gather materialization, overflow
# cumsum under netfilx degree skew, backward edge gathers)
if ! step_done r5_grcn_profile; then
  echo "=== GRCN netfilx profile start $(date +%H:%M:%S)"
  timeout 2400 python scripts/profile_model.py --Model GRCN \
    --data_path netfilx --data_root /root/reference/Data \
    > parity_logs/GRCN_netfilx.profile_r5.txt 2>&1
  rc=$?
  echo "=== GRCN netfilx profile exit $rc $(date +%H:%M:%S)"
  [ -f parity_logs/GRCN_netfilx.profile_r5.txt ] && mark_done r5_grcn_profile "rc=$rc"
fi

# ---- 10. MHRec re-times (step measured 49.5 ms vs r4's 71.4 — update
# the speed rows at HEAD)
if ! step_done r5_mhrec_phasec; then
  echo "=== MHRec phaseC re-time start $(date +%H:%M:%S)"
  CHAOREC_MHREC_PHASE_C_ONLY=1 timeout 3000 python \
    scripts/run_speed_single.py --Model MHRec --data_path beauty \
    --num_epoch 8 --data_root /root/reference/Data --log_dir /tmp \
    > parity_logs/MHRec_beauty.phaseC.speed.stdout 2>&1
  rc=$?
  echo "=== MHRec phaseC exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_mhrec_phasec
fi
if ! step_done r5_mhrec_full; then
  echo "=== MHRec full re-time start $(date +%H:%M:%S)"
  timeout 3600 python scripts/run_speed_single.py --Model MHRec \
    --data_path beauty --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/MHRec_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== MHRec full exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_mhrec_full
fi

# ---- 11. LATTICE microlens re-time (row-mode block operators)
if ! step_done r5_lattice_retime; then
  echo "=== LATTICE microlens re-time start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model LATTICE \
    --data_path microlens --num_epoch 8 --data_root /root/reference/Data \
    --log_dir /tmp > parity_logs/LATTICE_microlens.speed.stdout 2>&1
  rc=$?
  echo "=== LATTICE re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r5_lattice_retime
fi
