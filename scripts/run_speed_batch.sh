#!/bin/bash
# Epoch-time comparison runs for the heavyweight multimodal models
# (quality not comparable - snapshot lacks real modality features - but
# epoch wall-clock vs the reference logs is). Single grid combo each:
# full grids recompile the epoch program per combo and only the steady-
# state epoch time matters here.
set -u
cd /root/repo
mkdir -p parity_logs
DATA=/root/reference/Data
run() {
  local model="$1" data="$2" tmo="$3"; shift 3
  echo "=== $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python scripts/run_speed_single.py --Model "$model" \
      --data_path "$data" --data_root "$DATA" --log_dir parity_logs \
      --num_epoch 6 "$@" > "parity_logs/${model}_${data}.stdout" 2>&1
  echo "=== $model/$data exit $? $(date +%H:%M:%S)"
}
run GUME sports 1800
run SMORE sports 1800
run COHESION sports 1800
run MMSSL beauty 1800
run DiffMM beauty 1800
run MHRec beauty 2400
run DRAGON sports 1800
run LightGT beauty 1800
run MGCN sports 1800
run LATTICE microlens 2400
