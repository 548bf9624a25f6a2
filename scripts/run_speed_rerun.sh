#!/bin/bash
# Re-time GUME/SMORE/COHESION with the final kernels (batched towers,
# string-yaml fix, closure fix). Long timeouts: these models compile ~10min.
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
run GUME sports 2400
run SMORE sports 2400
run COHESION sports 2400
