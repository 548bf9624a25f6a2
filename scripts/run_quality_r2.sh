#!/bin/bash
# Round-2/3 evidence queue, PRIORITY-ORDERED so the cheapest, most
# important artifacts land first even if the TPU tunnel returns late in
# the round:
#   phase 1 — bench contract lines + fused-attn validation (~30 min)
#   phase 2 — speed re-times for every structurally-changed model (~1.5 h)
#   phase 3 — full quality runs at the REFERENCE's own best combos
#             (multi-hour; supervised + checkpointed, resume on flap)
# Logs land in parity_logs/ (tracked in git).
set -u
cd /root/repo
mkdir -p parity_logs
DATA=/root/reference/Data

# ---------------------------------------------------------------- phase 1
# Bench contract FIRST: the round's headline artifact (BENCH_r02 was lost
# to a tunnel flap; never again). bench.py itself waits for the backend.
echo "=== B bench start $(date +%H:%M:%S)"
timeout 3600 python bench.py > parity_logs/bench_r3.stdout 2>&1
echo "=== B bench exit $? $(date +%H:%M:%S)"

# Fused-attention kernel validation on the real chip; on failure
# CHAOREC_NO_FUSED_ATTN=1 forces plain-XLA attention for all CF_Diff
# runs so a Mosaic miscompile cannot poison the quality row.
echo "=== V fused-attn validation $(date +%H:%M:%S)"
if timeout 1800 python scripts/validate_attn_tpu.py \
    > parity_logs/attn_validation.txt 2>&1; then
  echo "=== V ok $(date +%H:%M:%S)"
else
  echo "=== V FAILED rc=$? - forcing XLA attention for all further runs"
  export CHAOREC_NO_FUSED_ATTN=1
fi

# ---------------------------------------------------------------- phase 2
# Re-time every model whose step program changed after the r2 speed
# table was captured (tower batching, scatter-free propagation, bf16
# sampling, dense item graphs, fused attention).
speed() {
  local model="$1" data="$2" tmo="$3"
  echo "=== S $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python scripts/run_speed_single.py --Model "$model" \
      --data_path "$data" --num_epoch 8 --data_root "$DATA" \
      --log_dir /tmp > "parity_logs/${model}_${data}.speed.stdout" 2>&1
  echo "=== S $model/$data exit $? $(date +%H:%M:%S)"
}
timeout 3000 python scripts/run_speed_single.py --Model CF_Diff \
    --data_path beauty --num_epoch 6 --data_root "$DATA" \
    --log_dir /tmp > parity_logs/CF_Diff_beauty.speed.stdout 2>&1
echo "=== S CF_Diff/beauty exit $? $(date +%H:%M:%S)"
speed SMORE sports 2400
speed DRAGON sports 2400
speed MICRO microlens 3000
# round-3 structural changes: LATTICE dense-bf16 item graph, MHRec bf16
# phase-B sampling, DiffMM bf16 rebuild
speed LATTICE microlens 3000
speed MHRec beauty 3600
speed DiffMM beauty 2400
# apples-to-apples vs log/MHRec_beauty.log (~4 s), which provably ran
# phase C only (zero diffusion-phase lines vs
# train_and_evaluate.py:337-364)
CHAOREC_MHREC_PHASE_C_ONLY=1 timeout 3000 python scripts/run_speed_single.py \
    --Model MHRec --data_path beauty --num_epoch 8 --data_root "$DATA" \
    --log_dir /tmp > parity_logs/MHRec_beauty.phaseC.speed.stdout 2>&1
echo "=== S MHRec/beauty phase-C-only exit $? $(date +%H:%M:%S)"

# ---------------------------------------------------------------- phase 3
# Full early-stopped quality runs at the reference's own best combos
# (VERDICT r1 item 6 / r2 item 4). Supervised + checkpointed: a tunnel
# flap mid-run relaunches and resumes from the last orbax checkpoint.
combo() {
  local model="$1" data="$2" tmo="$3" json="$4"
  echo "=== C $model/$data start $(date +%H:%M:%S)"
  timeout "$tmo" python -m chaorec_tpu.elastic --retries 4 \
      --backend-wait 1800 -- \
      python scripts/run_combo.py --Model "$model" \
      --data_path "$data" --data_root "$DATA" --log_dir parity_logs \
      --checkpoint_dir "/tmp/ckpt_${model}_${data}" --checkpoint_every 10 \
      --combo "$json" \
      > "parity_logs/${model}_${data}.stdout" 2>&1
  echo "=== C $model/$data exit $? $(date +%H:%M:%S)"
}

# Cheapest first (clothing id-only targets with FULL reference best
# blocks), then the multi-hour netfilx/beauty runs.
combo BSPM clothing 7200 '{"K_s": 4, "T_s": 2, "K_b": 1, "T_b": 1, "idl_beta": 1.0}'
combo LightGODE clothing 7200 '{"gamma": 0.2, "learning_rate": 0.001, "t": 5.0}'
combo FKAN_GCF clothing 10800 '{"n_layers": 3, "learning_rate": 0.001, "reg_weight": 1, "node_dropout": 0.2, "message_dropout": 0, "grid_size": 2}'

# DiffRec/beauty: ref best 0.06402 (log truncated before the Best block
# on later combos; this is its best logged combo).
combo DiffRec beauty 7200 '{"learning_rate": 0.0005, "noise_scale": 0.001, "noise_min": 0.005, "noise_max": 0.005, "steps": 5, "dims": "[1000]"}'

# GFormer/beauty: finish the r1 run that was cut at timeout
# (ref log/GFormer_beauty.log best 0.12273 at this combo, 89 epochs).
combo GFormer beauty 10800 '{"n_layers": 1, "pnn_layer": 1, "reg_weight": 0.0001, "ssl_alpha": 1, "b2": 0.1, "ctra": 0.0001, "learning_rate": 0.001}'

# AdaGCL/netfilx: ref grid best 0.21549 at this combo
# (96-combo grid took the reference ~40 GPU-hours; re-scoped to the
# ref's best combo only — the r2 combo-4 grid partial was retired,
# VERDICT r2 item 9).
combo AdaGCL netfilx 10800 '{"n_layers": 2, "learning_rate": 0.001, "reg_weight": 0.1, "ssl_alpha": 0.2, "ssl_temp": 0.5}'

# HCCF/netfilx: ref best 0.2331 at this combo (21-combo partial log).
combo HCCF netfilx 10800 '{"n_layers": 3, "learning_rate": 0.001, "reg_weight": 1e-05, "ssl_alpha": 0.1, "ssl_temp": 0.5, "leaky": 1.0, "keepRate": 1.0, "mult": 0.01}'

# CF_Diff/beauty LAST (tail absorber): ref log truncated (no Best
# block); full early-stopped run at the first yaml combo for the
# trajectory/quality record.
echo "=== Q CF_Diff/beauty start $(date +%H:%M:%S)"
timeout 18000 python scripts/run_speed_single.py --Model CF_Diff \
    --data_path beauty --data_root "$DATA" --log_dir parity_logs \
    > parity_logs/CF_Diff_beauty.stdout 2>&1
echo "=== Q CF_Diff/beauty exit $? $(date +%H:%M:%S)"
echo "=== ALL DONE $(date +%H:%M:%S)"
