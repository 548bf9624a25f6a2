#!/bin/bash
# Round-4 follow-up TPU session: traces for the remaining perf targets.
# Chained behind run_r4_session.sh via the same blocking flock.
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4b session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r4_trace_MHRec_phaseC; then
  echo "=== MHRec phaseC trace start $(date +%H:%M:%S)"
  rm -rf /tmp/mhrec_prof_r4
  CHAOREC_MHREC_PHASE_C_ONLY=1 timeout 3000 python \
    scripts/run_speed_single.py --Model MHRec --data_path beauty \
    --num_epoch 3 --data_root "$DATA" --log_dir /tmp \
    --profile_dir /tmp/mhrec_prof_r4 \
    > parity_logs/MHRec_beauty.phaseC.trace.txt 2>&1
  rc=$?
  python scripts/summarize_trace.py /tmp/mhrec_prof_r4 40 \
    >> parity_logs/MHRec_beauty.phaseC.trace.txt 2>&1 || true
  echo "=== MHRec phaseC trace exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4_trace_MHRec_phaseC
fi

for M in SMORE DRAGON; do
  key="r4_breakdown_$M"
  if step_done "$key"; then continue; fi
  echo "=== $M breakdown start $(date +%H:%M:%S)"
  timeout 2400 python scripts/profile_model.py --Model "$M" \
    --data_path sports --data_root "$DATA" \
    > "parity_logs/${M}_sports.profile_r4.txt" 2>&1
  rc=$?
  echo "=== $M breakdown exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done "$key"
done

echo "=== R4B SESSION DONE $(date +%H:%M:%S)"
