#!/bin/bash
# Round-5 cross-framework oracle queue (VERDICT r4 missing #1).
#
# Runs reference-torch-on-CPU vs ours-on-CPU 6-epoch trajectory pairs on
# baby for every multimodal model not yet covered by parity_logs/xfw_*.
# CPU-only: never touches the TPU tunnel, so it can run in the background
# while TPU sessions probe/bench. Idempotent via parity_logs/.done/r5_xfw_*.
#
# Sandbox prep: DualGNN/DRAGON/COHESION need Data/baby/user_graph_dict.npy
# (reference reads it at init, Model/COHESION.py:95-99); MHRec needs
# hyperedges_{visual,textual}_u*_i*.npy (main.py:220-232). Both are
# generated with our deterministic scripts into the sandbox so the
# reference consumes exactly what our runtime fallback computes.
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
DONE=parity_logs/.done
mkdir -p "$DONE"

step_done() { [ -f "$DONE/$1" ]; }
mark_done() { echo "${2:-ok} $(date +%F_%H:%M:%S)" > "$DONE/$1"; }

# ---- sandbox prep (cheap, idempotent)
python - <<'EOF'
import sys
sys.path.insert(0, 'scripts')
from xfw_oracle import build_sandbox
build_sandbox('baby')
EOF
if [ ! -f /tmp/xfw_root/Data/baby/user_graph_dict.npy ]; then
  echo "=== gen user_graph_dict (sandbox) $(date +%H:%M:%S)"
  timeout 1200 python scripts/gen_user_graph.py --data_path baby \
    --data_root /tmp/xfw_root/Data
fi

MODELS="${XFW_MODELS:-VBPR BM3 MGCL SLMRec DDRec MGCN LGMRec GRCN MMGCL MENTOR DRAGON DualGNN LightGT MMGCN POWERec Grade MGAT MVGAE MHRec}"

for M in $MODELS; do
  if [ "$M" = MHRec ] && [ ! -e /tmp/xfw_root/Data/baby/hyperedges_visual_u10_i10.npy ]; then
    echo "=== gen hypergraph (sandbox) $(date +%H:%M:%S)"
    timeout 2400 python scripts/gen_hypergraph.py --data_path baby \
      --data_root /tmp/xfw_root/Data || true
  fi
  key="r5_xfw_ref_$M"
  if ! step_done "$key"; then
    echo "=== xfw ref $M start $(date +%H:%M:%S)"
    timeout 7200 python scripts/xfw_oracle.py --Model "$M" \
      --data_path baby --num_epoch 6 --ref-only --timeout 7000
    rc=$?
    echo "=== xfw ref $M exit $rc $(date +%H:%M:%S)"
    [ $rc -eq 0 ] && grep -q "Epoch 6" "parity_logs/xfw_${M}_baby.ref.log" \
      2>/dev/null && mark_done "$key"
  else
    echo "=== xfw ref $M SKIP"
  fi
  key="r5_xfw_ours_$M"
  if ! step_done "$key"; then
    echo "=== xfw ours $M start $(date +%H:%M:%S)"
    timeout 7200 python scripts/xfw_oracle.py --Model "$M" \
      --data_path baby --num_epoch 6 --ours-only --ours-cpu --timeout 7000 \
      --ours-data-root /tmp/xfw_root/Data
    rc=$?
    echo "=== xfw ours $M exit $rc $(date +%H:%M:%S)"
    [ $rc -eq 0 ] && grep -q "Epoch 6" "parity_logs/xfw_${M}_baby.ours.log" \
      2>/dev/null && mark_done "$key"
  else
    echo "=== xfw ours $M SKIP"
  fi
done
python scripts/xfw_report.py > /dev/null 2>&1 || true
echo "=== r5 xfw queue complete $(date +%H:%M:%S)"
