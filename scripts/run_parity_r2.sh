#!/bin/bash
# Round-2 sequential real-TPU parity runs (VERDICT r1 item 6):
# - full quality runs for id-only models with reference logs
#   (AdaGCL/netfilx 0.21549, NCL/sports, HCCF/netfilx, DiffRec/beauty,
#   CF_Diff/beauty)
# - speed-evidence re-runs for the rows whose logs were lost in the r1
#   workspace reset (DRAGON, DiffMM, MMSSL, MHRec, GUME, SMORE,
#   COHESION) plus LATTICE/microlens after the ELL rework
# Logs land in parity_logs/ (tracked in git).
set -u
cd /root/repo
mkdir -p parity_logs
DATA=/root/reference/Data

quality() {
  local model="$1" data="$2" tmo="$3"; shift 3
  echo "=== Q $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python main.py --Model "$model" --data_path "$data" \
      --data_root "$DATA" --log_dir parity_logs "$@" \
      > "parity_logs/${model}_${data}.stdout" 2>&1
  echo "=== Q $model/$data exit $? $(date +%H:%M:%S)"
}

speed() {
  local model="$1" data="$2" tmo="$3"; shift 3
  echo "=== S $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python scripts/run_speed_single.py --Model "$model" \
      --data_path "$data" --data_root "$DATA" --num_epoch 6 \
      --log_dir parity_logs "$@" \
      > "parity_logs/${model}_${data}.speed.stdout" 2>&1
  echo "=== S $model/$data exit $? $(date +%H:%M:%S)"
}

# ---- propagation-path microbench (PARITY.md n_layers evidence) ----
timeout 1800 python scripts/bench_spmm.py microlens 64 \
    > parity_logs/spmm_microlens.txt 2>&1

# ---- speed re-runs first (each ~5-20 min incl. compile) ----
speed LATTICE  microlens 1800
speed DRAGON   sports    1800
speed DiffMM   beauty    1800
speed MMSSL    beauty    1800
speed MHRec    beauty    2400
speed GUME     sports    2400
speed SMORE    sports    2400
speed COHESION sports    2400
speed MICRO    microlens 1800
speed MGCN     sports    1800

# ---- quality runs (early-stopped full runs) ----
quality AdaGCL  netfilx 14400
quality NCL     sports  10800
quality HCCF    netfilx 10800
quality DiffRec beauty  14400
quality CF_Diff beauty  18000
echo "=== ALL DONE $(date +%H:%M:%S)"
