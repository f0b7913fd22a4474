#!/bin/bash
# Round-3 queue C — replaces tpu_r3.sh's broken leg schedule and chains
# block B.  Root cause fixed: 900 s leg timeouts always fired BEFORE the
# first checkpoint save (startup ~6 min + steps_per_eval=2250 cadence),
# so every leg restarted from step 1.  Now the train loop saves every
# checkpoint_interval=250 steps (bounded loss on timeout-kill) and legs
# get 1800 s.  Touch /tmp/queue_stop to end at the next step boundary;
# /tmp/aug_stop | /tmp/sparse_stop skip the remaining legs of a phase.
set -x
cd /root/repo

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3c.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3c.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3c.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3c.log
  sleep 20
}

# --- 1: pillar aug accuracy legs (resume via periodic ckpts) ----------
for S in 750 1500 2250 3000 3750 4500 5250 6000 6750 7500; do
  [ -e /tmp/aug_stop ] && break
  step 1800 /tmp/aug_c_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 9000 --leg_until $S \
    --remat 0 --tag aug
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_aug .proxy_store/ 2>/dev/null
done
step 2400 /tmp/eval_aug.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug
step 2400 /tmp/eval_aug_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug --ckpt_step best
step 1200 /tmp/diag_pairtypes_aug.log python -u scripts/diag_pairtypes.py \
  PillarMiddleCov 6 --tag=aug

# --- 2: clean profiling numbers (fixed harnesses) ---------------------
step 1800 /tmp/band_pallas_r3b.log python -u scripts/check_band_pallas.py
step 1800 /tmp/band_stages_r3b.log python -u scripts/profile_band_stages.py
step 1800 /tmp/vox_stages_r3b.log python -u scripts/profile_voxelize.py
step 1800 /tmp/nn_r3b.log python -u scripts/profile_nn.py

# --- 3: sparse bench with the round-3 levers --------------------------
step 2400 /tmp/bench_sparse_r3b.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  python -u bench.py

# --- 4: train-step breakdown (VERDICT r2 #7) --------------------------
step 2400 /tmp/train_breakdown_r3b.log \
  python -u scripts/profile_train_breakdown.py

# --- 5: matched-budget sparse aug training (band engine) --------------
DEADLINE=$(( $(date +%s) + 28800 ))   # stop starting new legs after 8 h
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

# --- 6: final dual-line bench (+streaming row) + report ---------------
step 3000 /tmp/bench_r3b_final.log \
  env RSLO_BENCH_STREAMING=1 python -u bench.py
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r3.log 2>&1
echo "$(date +%H:%M:%S) R3C QUEUE DONE" >> /tmp/tpu_r3c.log
