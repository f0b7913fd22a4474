#!/bin/bash
# Round-3 block B (runs after tpu_r3.sh's aug accuracy queue):
#   1. clean band-engine numbers with the fixed profilers (the r2
#      readings were DCE-distorted and profiled aliased geometry);
#   2. sparse-path bench with the round-3 levers in (lane-aligned 384
#      subm window -> fused Pallas kernel engages; per-level dispatch
#      keeps C<64 levels on rulebook gathers);
#   3. train-step breakdown (VERDICT r2 #7);
#   4. matched-budget sparse self-sup training + eval (VERDICT r2 #3)
#      with the SAME aug schedule/budget as the pillar run;
#   5. final dual-line bench (insurance for the driver's bench run).
# Touch /tmp/queue_stop to end at the next step boundary;
# /tmp/sparse_stop skips remaining sparse legs.
set -x
cd /root/repo

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3b.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3b.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3b.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3b.log
  sleep 20
}

# --- 1+2: clean microbench + stage split + sparse bench ---------------
step 1800 /tmp/band_pallas_r3b.log python -u scripts/check_band_pallas.py
step 1800 /tmp/band_stages_r3b.log python -u scripts/profile_band_stages.py
# env(1) keeps the assignment scoped to this step (a VAR=x prefix on a
# bash FUNCTION call would leak into the rest of the script)
step 2400 /tmp/bench_sparse_r3b.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  python -u bench.py

step 1800 /tmp/vox_stages_r3b.log python -u scripts/profile_voxelize.py
step 1800 /tmp/nn_r3b.log python -u scripts/profile_nn.py

# --- 3: train-step breakdown ------------------------------------------
step 2400 /tmp/train_breakdown_r3b.log \
  python -u scripts/profile_train_breakdown.py

# --- 4: matched-budget sparse aug training (band engine) --------------
# Same budget as the pillar aug run (7500 steps, same slerp-aug
# schedule from base_cfg).  Legs keep host RSS bounded (CLAUDE.md).
DEADLINE=$(( $(date +%s) + 18000 ))   # stop starting new legs after 5 h
for S in 750 1500 2250 3000 3750 4500 5250 6000 6750 7500; do
  [ -e /tmp/sparse_stop ] && break
  [ "$(date +%s)" -gt "$DEADLINE" ] && break
  step 1800 /tmp/sparse_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 9000 --leg_until $S \
    --engine band --tag aug
  cp -r /tmp/rslo_proxy/model_SparseMiddleCov_aug .proxy_store/ 2>/dev/null
done
step 2400 /tmp/eval_sparse_aug.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug
step 2400 /tmp/eval_sparse_aug_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug --ckpt_step best

# --- 5: final dual-line bench (+streaming row) + report ---------------
step 3000 /tmp/bench_r3b_final.log \
  env RSLO_BENCH_STREAMING=1 python -u bench.py
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r3b.log 2>&1
echo "$(date +%H:%M:%S) R3B QUEUE DONE" >> /tmp/tpu_r3b.log
