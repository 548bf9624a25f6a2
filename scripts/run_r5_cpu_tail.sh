#!/bin/bash
# r5 CPU tail queue: runs after the xfw oracle queue drains.
# 1. FREEDOM bf16-mode oracle trajectory (quality delta of
#    --relaxed_precision bf16 vs the fp32 pair, same seed/features).
# 2. BSPM fp32-vs-fp64 sample control (VERDICT weak #7).
set -u
cd /root/repo
if [ -f /tmp/r5_xfw.pid ]; then
  while kill -0 "$(cat /tmp/r5_xfw.pid)" 2>/dev/null; do sleep 60; done
fi
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
DONE=parity_logs/.done
mkdir -p "$DONE"

if [ ! -f "$DONE/r5_freedom_bf16_oracle" ]; then
  echo "=== FREEDOM bf16 oracle start $(date +%H:%M:%S)"
  mkdir -p /tmp/xfw_bf16_logs
  timeout 5400 python scripts/run_combo.py --Model FREEDOM \
    --data_path baby --data_root /tmp/xfw_root/Data \
    --log_dir /tmp/xfw_bf16_logs --num_epoch 6 --relaxed_precision bf16 \
    --combo '{"learning_rate": 0.001, "reg_weight": 0.001, "n_layers": 2, "mm_layers": 1, "ii_topk": 10, "dropout": 0.1, "lambda_coeff": 0.8}' \
    > parity_logs/xfw_FREEDOM_baby.bf16.stdout 2>&1
  rc=$?
  cp /tmp/xfw_bf16_logs/FREEDOM_baby.log \
     parity_logs/xfw_FREEDOM_baby.bf16.log 2>/dev/null
  echo "=== FREEDOM bf16 oracle exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo ok > "$DONE/r5_freedom_bf16_oracle"
fi

if [ ! -f "$DONE/r5_bspm_fp64_probe" ]; then
  echo "=== BSPM fp64 probe start $(date +%H:%M:%S)"
  JAX_ENABLE_X64=1 timeout 10800 python scripts/probe_bspm_fp64.py \
    --data_path sports --sample 4000 \
    > parity_logs/bspm_fp64_probe.txt 2>&1
  rc=$?
  echo "=== BSPM fp64 probe exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && echo ok > "$DONE/r5_bspm_fp64_probe"
fi
echo "=== r5 cpu tail complete $(date +%H:%M:%S)"
