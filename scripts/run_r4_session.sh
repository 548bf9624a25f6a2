#!/bin/bash
# Round-4 focused TPU session. Holds the evidence-queue lock
# (/tmp/quality_r2.lock) for the duration so the r3 watchdog cannot
# relaunch the queue mid-session; on exit the watchdog resumes the
# r3 queue exactly where its .done markers left it.
#
# Steps (all idempotent via parity_logs/.done/r4_*):
#   1. xfw ours-side trajectories (TPU) for the 8 oracle models
#   2. MHRec phase-C + full speed re-time (post attention-fusion)
#   3. NGCF beauty speed re-time (post edge-space dropout)
#   4. LATTICE microlens profile + speed re-time
#   5. BSPM sports grid + clothing combo (host-eigsh fix)
#   6. LightGODE sports seed repeats (42/43/44 at the parity combo)
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4 session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"

step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

# ---- 1. xfw ours side (TPU; ref side runs separately on CPU)
for M in FREEDOM GUME SMORE COHESION MICRO LATTICE MMSSL DiffMM; do
  key="r4_xfw_ours_$M"
  if step_done "$key"; then echo "=== xfw ours $M SKIP"; continue; fi
  echo "=== xfw ours $M start $(date +%H:%M:%S)"
  timeout 2700 python scripts/xfw_oracle.py --Model "$M" \
    --data_path baby --num_epoch 6 --ours-only --timeout 2600
  rc=$?
  echo "=== xfw ours $M exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && grep -q "Epoch 6" "parity_logs/xfw_${M}_baby.ours.log" \
    && mark_done "$key"
done
python scripts/xfw_report.py > /dev/null 2>&1 || true

# ---- 2. MHRec speed re-times
if ! step_done r4_speed_MHRec_phaseC; then
  echo "=== MHRec phaseC start $(date +%H:%M:%S)"
  CHAOREC_MHREC_PHASE_C_ONLY=1 timeout 3000 python \
    scripts/run_speed_single.py --Model MHRec --data_path beauty \
    --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
    > parity_logs/MHRec_beauty.phaseC.speed.stdout 2>&1
  rc=$?
  echo "=== MHRec phaseC exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_speed_MHRec_phaseC
fi
if ! step_done r4_speed_MHRec; then
  echo "=== MHRec full start $(date +%H:%M:%S)"
  timeout 3600 python scripts/run_speed_single.py --Model MHRec \
    --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
    > parity_logs/MHRec_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== MHRec full exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_speed_MHRec
fi

# ---- 3. NGCF speed re-time
if ! step_done r4_speed_NGCF; then
  echo "=== NGCF start $(date +%H:%M:%S)"
  timeout 1800 python scripts/run_speed_single.py --Model NGCF \
    --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
    > parity_logs/NGCF_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== NGCF exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_speed_NGCF
fi

# ---- 4. LATTICE step breakdown + trace + re-time
if ! step_done r4_prof_LATTICE; then
  echo "=== LATTICE profile start $(date +%H:%M:%S)"
  timeout 2400 python scripts/profile_model.py --Model LATTICE \
    --data_path microlens --data_root "$DATA" \
    > parity_logs/LATTICE_microlens.profile_r4.txt 2>&1
  rc=$?
  rm -rf /tmp/lattice_prof_r4
  timeout 2400 python scripts/run_speed_single.py --Model LATTICE \
    --data_path microlens --num_epoch 4 --data_root "$DATA" \
    --log_dir /tmp --profile_dir /tmp/lattice_prof_r4 \
    >> parity_logs/LATTICE_microlens.profile_r4.txt 2>&1
  rc2=$?
  python scripts/summarize_trace.py /tmp/lattice_prof_r4 40 \
    >> parity_logs/LATTICE_microlens.profile_r4.txt 2>&1 || true
  echo "=== LATTICE profile exit $rc/$rc2 $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && [ $rc2 -eq 0 ] && mark_done r4_prof_LATTICE
fi

# ---- 5. BSPM re-runs with host-eigsh factors
if ! step_done grid_BSPM_sports; then
  echo "=== BSPM sports grid start $(date +%H:%M:%S)"
  timeout 7200 python main.py --Model BSPM --data_path sports \
    --data_root "$DATA" --log_dir parity_logs \
    > parity_logs/BSPM_sports.stdout 2>&1
  rc=$?
  echo "=== BSPM sports exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && grep -q "Best performance" parity_logs/BSPM_sports.log \
    && mark_done grid_BSPM_sports
fi
if ! step_done combo_BSPM_clothing; then
  echo "=== BSPM clothing start $(date +%H:%M:%S)"
  timeout 5400 python scripts/run_combo.py --Model BSPM \
    --data_path clothing --data_root "$DATA" --log_dir parity_logs \
    --combo '{"K_s": 4, "T_s": 2, "K_b": 1, "T_b": 1, "idl_beta": 1.0}' \
    > parity_logs/BSPM_clothing.stdout 2>&1
  rc=$?
  echo "=== BSPM clothing exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && grep -q "Best performance" parity_logs/BSPM_clothing.log \
    && mark_done combo_BSPM_clothing
fi

# ---- 6. LightGODE sports seed repeats (VERDICT r3 item 10)
for SEED in 43 44; do
  key="r4_seed_LightGODE_sports_$SEED"
  if step_done "$key"; then continue; fi
  echo "=== LightGODE seed $SEED start $(date +%H:%M:%S)"
  timeout 3600 python scripts/run_combo.py --Model LightGODE \
    --data_path sports --data_root "$DATA" --log_dir /tmp/seed_runs_$SEED \
    --seed "$SEED" \
    --combo '{"gamma": 0.2, "learning_rate": 0.001, "t": 1.2}' \
    > "parity_logs/LightGODE_sports.seed$SEED.stdout" 2>&1
  rc=$?
  cp "/tmp/seed_runs_$SEED/LightGODE_sports.log" \
     "parity_logs/LightGODE_sports.seed$SEED.log" 2>/dev/null
  echo "=== LightGODE seed $SEED exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done "$key"
done

python scripts/parity_speed_report.py > parity_logs/speed_report.txt 2>&1 || true
python scripts/parity_quality_report.py > parity_logs/quality_report.txt 2>&1 || true
echo "=== R4 SESSION DONE $(date +%H:%M:%S) — releasing queue lock"
