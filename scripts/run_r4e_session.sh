#!/bin/bash
# Round-4 fifth TPU session: re-run the 413-artifact probes with
# arg-passing (gen/loss1), probe the WHOLE-EPOCH Grade/sports unit (the
# one the crashed runs dispatched), re-run the fixed MHRec bench, and
# measure LATTICE/microlens under the ELL UI path vs the dense default.
# Chained behind the r4d lock holder; idempotent via .done markers.
set -u
cd /root/repo
exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4e session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

if ! step_done r4e_probe_grade2; then
  for c in gen loss1 epoch; do
    echo "=== probe2 $c start $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    timeout 2400 python scripts/probe_grade_crash.py --Model Grade \
        --data_path sports --data_root "$DATA" --component "$c" \
        >> parity_logs/grade_crash_probe.txt 2>&1
    rc=$?
    echo "=== probe2 $c exit rc=$rc $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    [ $rc -ne 0 ] && sleep 60
  done
  mark_done r4e_probe_grade2
fi

if ! step_done r4d_bench_mhrec; then
  echo "=== bench_mhrec retry start $(date +%H:%M:%S)"
  timeout 2400 python scripts/bench_mhrec.py --data_path beauty \
      --data_root "$DATA" > parity_logs/MHRec_beauty.phaseC.bench.txt 2>&1
  rc=$?
  echo "=== bench_mhrec retry exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_bench_mhrec
fi

# gather/scatter primitive rates on beauty-like shapes (floor table)
if ! step_done r4e_bench_gather; then
  echo "=== bench_gather start $(date +%H:%M:%S)"
  timeout 1200 python scripts/bench_gather.py \
      > parity_logs/gather_rates.txt 2>&1
  rc=$?
  echo "=== bench_gather exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4e_bench_gather
fi

# LATTICE UI propagation: force the ELL path (dense_prop_threshold=1)
# against the r4c dense re-time (4.136 s median)
if ! step_done r4e_speed_LATTICE_ell; then
  echo "=== LATTICE ELL start $(date +%H:%M:%S)"
  timeout 3000 python scripts/run_speed_single.py --Model LATTICE \
      --data_path microlens --num_epoch 8 --data_root "$DATA" \
      --log_dir /tmp --dense_prop_threshold 1 \
      > parity_logs/LATTICE_microlens.ell.speed.stdout 2>&1
  rc=$?
  echo "=== LATTICE ELL exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4e_speed_LATTICE_ell
fi

python scripts/parity_speed_report.py > parity_logs/speed_report.txt 2>&1 || true
echo "=== R4E SESSION DONE $(date +%H:%M:%S)"
