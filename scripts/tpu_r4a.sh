#!/bin/bash
# Round-4 queue A — rotation-collapse discriminator + perf probe.
#   1. SUPERVISED control on the world-v2 store (cheap, ~35 min):
#      if the control nails val rotation -> self-sup objective issue;
#      if it also predicts near-straight -> data/world issue (fix =
#      world v3 with sustained-turn curvature diversity, in prep).
#   2. diag_preds on the control (signed yaw corr/ratio on val).
#   3. plan-lookup A/B probe (ranked vs slot_map rulebook lookup,
#      queued since r3g; measures the post-ADVICE-fix code).
# Serial: ONE TPU process at a time.
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4a.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4a.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4a.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4a.log
  sleep 15
}

# --- 1: supervised control on world v2 --------------------------------
step 5400 /tmp/r4_sup_train.log python -u scripts/accuracy_proxy.py \
  train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
  --tag r4
step 2400 /tmp/r4_sup_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4
step 2400 /tmp/r4_sup_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4 --ckpt_step best
cp -r /tmp/rslo_proxy/model_PillarMiddleCov_sup_r4 .proxy_store/ 2>/dev/null

# --- 2: rotation diagnostics on the control ---------------------------
step 2400 /tmp/r4_sup_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=r4

# --- 3: plan-lookup A/B (ranked vs slot_map) --------------------------
step 2400 /tmp/r4_plan_lookup.log python -u scripts/profile_plan_lookup.py

echo "$(date +%H:%M:%S) R4A QUEUE DONE" >> /tmp/tpu_r4a.log
