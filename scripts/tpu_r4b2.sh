#!/bin/bash
# Round-4 queue B2 — world v3 ("urban": varied speed, UNSCALED yaw) +
# the long self-sup run + matched sparse + bench.
#
# Background (BENCH_NOTES r4): world v2's yaw-prop-to-speed coupling
# halved train yaw magnitudes and correlated |yaw| with speed; 3k-step
# supervised controls could not learn rotation WITH or WITHOUT augs.
# v3 decouples them (v1's yaw drive + v2's speed diversity).
#
#   1. supervised gate-control on v3 (3000 steps): rotation must be
#      learnable before burning the long run
#   2. pillar self-sup, tag r4, steps=30000, legs of 10000
#   3. diag_pseudo after leg 1; evals final/best/loops; diag_preds
#   4. sparse (band) self-sup to 9000 + evals
#   5. perf block (gather probe + plan-lookup A/B with slot_planes)
#   6. final dual bench with streaming fields
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v3

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4b2.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4b2.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4b2.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4b2.log
  sleep 15
}

# --- 1: supervised gate-control on v3 ---------------------------------
for S in 1500 3000; do
  [ -e /tmp/sup_stop ] && break
  step 3600 /tmp/r4_v3sup_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
    --tag v3 --leg_until $S --steps_per_eval 750
done
step 2400 /tmp/r4_v3sup_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag v3
step 2400 /tmp/r4_v3sup_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=v3

# --- 2: pillar self-sup 30k (time-gated: skip later legs when the
# --- round budget runs short; driver round ends ~17:30) ---------------
for S in 10000 20000 30000; do
  [ -e /tmp/aug_stop ] && break
  if [ "$S" != "10000" ] && [ "$(date +%H%M)" -gt 1500 ]; then
    echo "$(date +%H:%M:%S) time gate: stopping pillar legs at $S"       >> /tmp/tpu_r4b2.log
    break
  fi
  step 4200 /tmp/r4_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 30000 --leg_until $S \
    --remat 0 --tag r4 --steps_per_eval 1500
  cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r4 .proxy_store/v3/ 2>/dev/null
  if [ "$S" = "10000" ]; then
    step 2400 /tmp/r4_pseudo.log python -u scripts/diag_pseudo.py \
      PillarMiddleCov 8 --tag=r4
  fi
done

# --- 3: evals ----------------------------------------------------------
step 2400 /tmp/r4_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4
step 2400 /tmp/r4_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --ckpt_step best
step 3000 /tmp/r4_eval_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --refine --refine_loops
step 2400 /tmp/r4_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=r4

# --- 4: sparse (band) to 9000 (second leg time-gated) ------------------
for S in 4500 9000; do
  [ -e /tmp/sparse_stop ] && break
  if [ "$S" = "9000" ] && [ "$(date +%H%M)" -gt 1530 ]; then
    echo "$(date +%H:%M:%S) time gate: stopping sparse legs at $S"       >> /tmp/tpu_r4b2.log
    break
  fi
  step 4200 /tmp/r4_sparse_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 9000 --leg_until $S \
    --engine band --tag r4 --steps_per_eval 1500
  cp -r $RSLO_PROXY_ROOT/model_SparseMiddleCov_r4 .proxy_store/v3/ 2>/dev/null
done
step 2400 /tmp/r4_sparse_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4
step 2400 /tmp/r4_sparse_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4 --ckpt_step best

# --- 5: perf block -----------------------------------------------------
step 1800 /tmp/r4_gather.log python -u scripts/probe_gather.py
step 2400 /tmp/r4_plan_lookup2.log python -u scripts/profile_plan_lookup.py

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4.log 2>&1
step 2400 /tmp/bench_r4.log env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R4B2 QUEUE DONE" >> /tmp/tpu_r4b2.log
