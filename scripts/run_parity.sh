#!/bin/bash
# Sequential real-TPU parity runs; logs land in parity_logs/ (tracked in git,
# unlike the gitignored log/). Each run is bounded by timeout.
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
run LightGCN beauty 2400
run MCLN beauty 5400
run CF_Diff beauty 5400
run BSPM beauty 2400
