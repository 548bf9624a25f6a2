#!/bin/bash
# Parity batch 2: remaining id-only reference logs with Best blocks.
set -u
cd /root/repo
mkdir -p parity_logs
DATA=/root/reference/Data
run() {
  local model="$1" data="$2" tmo="$3"; shift 3
  echo "=== $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python main.py --Model "$model" --data_path "$data" \
      --data_root "$DATA" --log_dir parity_logs "$@" \
      > "parity_logs/${model}_${data}.stdout" 2>&1
  echo "=== $model/$data exit $? $(date +%H:%M:%S)"
}
run LightGCN netfilx 3600
run BSPM sports 3600
run FKAN_GCF sports 7200
run LightGODE sports 10800
