#!/bin/bash
# Round-4 fourth TPU session: Grade/sports crash bisection, MHRec
# phase-C component timings, NGCF re-time after the sorted two-way
# propagate, MMSSL re-measurements after the reference-quirk fixes,
# first SGL/AdaGCL speed rows. Takes the chip by stopping the current
# quality-queue pass (idempotent via parity_logs/.done markers) and
# holding the queue lock; the watchdog relaunches the queue when the
# lock frees.
set -u
cd /root/repo

kill_tree() {
  local p=$1 c
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do kill_tree "$c"; done
  kill "$p" 2>/dev/null
}

# stop the running queue pass (exact-argv match; never pattern-kill)
for qpid in $(ps -eo pid,args | awk '$2=="bash" && $3=="/root/repo/scripts/run_quality_r2.sh" {print $1}'); do
  echo "stopping queue pass pid=$qpid"
  kill_tree "$qpid"
done
sleep 3

exec 9>/tmp/quality_r2.lock
flock 9 || exit 1
echo "r4d session holds queue lock $(date +%H:%M:%S)"
DATA=/root/reference/Data
DONE=parity_logs/.done
mkdir -p "$DONE"
step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

# 1. Grade/sports crash bisection (each component its own process; a
#    worker crash poisons the client but the backend self-restarts)
if ! step_done r4d_probe_grade; then
  : > parity_logs/grade_crash_probe.txt
  for c in enc edge_prob gen_view bpr gen loss1 step eval; do
    echo "=== probe $c start $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    timeout 1800 python scripts/probe_grade_crash.py --Model Grade \
        --data_path sports --data_root "$DATA" --component "$c" \
        >> parity_logs/grade_crash_probe.txt 2>&1
    rc=$?
    echo "=== probe $c exit rc=$rc $(date +%H:%M:%S)" | tee -a parity_logs/grade_crash_probe.txt
    if [ $rc -ne 0 ]; then
      # give the backend time to restart before the next component
      sleep 60
    fi
  done
  mark_done r4d_probe_grade
fi

# 2. MHRec phase-C component timings
if ! step_done r4d_bench_mhrec; then
  echo "=== bench_mhrec start $(date +%H:%M:%S)"
  timeout 2400 python scripts/bench_mhrec.py --data_path beauty \
      --data_root "$DATA" > parity_logs/MHRec_beauty.phaseC.bench.txt 2>&1
  rc=$?
  echo "=== bench_mhrec exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_bench_mhrec
fi

# 3. NGCF re-time after sorted_two_way_propagate
if ! step_done r4d_speed_NGCF2; then
  echo "=== NGCF re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model NGCF \
      --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
      > parity_logs/NGCF_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== NGCF re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_speed_NGCF2
fi

# 4. MMSSL xfw ours on TPU (quirk-fix validation vs the committed ref log)
if ! step_done r4d_xfw_MMSSL2; then
  echo "=== xfw MMSSL ours start $(date +%H:%M:%S)"
  timeout 2400 python scripts/xfw_oracle.py --Model MMSSL --data_path baby \
      --num_epoch 6 --ours-only > /tmp/xfw_mmssl_tpu.log 2>&1
  rc=$?
  echo "=== xfw MMSSL ours exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_xfw_MMSSL2
fi

# 5. MMSSL beauty speed re-time (attention got cheaper)
if ! step_done r4d_speed_MMSSL2; then
  echo "=== MMSSL re-time start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model MMSSL \
      --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
      > parity_logs/MMSSL_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== MMSSL re-time exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_speed_MMSSL2
fi

# 6. SGL beauty first speed row (sorted two-way views)
if ! step_done r4d_speed_SGL; then
  echo "=== SGL speed start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model SGL \
      --data_path beauty --num_epoch 8 --data_root "$DATA" --log_dir /tmp \
      > parity_logs/SGL_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== SGL speed exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_speed_SGL
fi

# 7. AdaGCL beauty quick speed row (below the crash-size threshold)
if ! step_done r4d_speed_AdaGCL; then
  echo "=== AdaGCL speed start $(date +%H:%M:%S)"
  timeout 2400 python scripts/run_speed_single.py --Model AdaGCL \
      --data_path beauty --num_epoch 6 --data_root "$DATA" --log_dir /tmp \
      > parity_logs/AdaGCL_beauty.speed.stdout 2>&1
  rc=$?
  echo "=== AdaGCL speed exit $rc $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && mark_done r4d_speed_AdaGCL
fi

python scripts/parity_speed_report.py > parity_logs/speed_report.txt 2>&1 || true
echo "=== R4D SESSION DONE $(date +%H:%M:%S)"
