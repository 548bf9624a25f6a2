#!/bin/bash
# Regenerate evidence logs for the remaining quality-parity table rows
# (full early-stopped runs at the reference configs).
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
run NGCF beauty 1800
run DHCF beauty 1800
run FKAN_GCF beauty 1800
run GFormer beauty 2400
run LightGODE beauty 2400
