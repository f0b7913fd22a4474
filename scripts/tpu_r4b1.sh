#!/bin/bash
# Round-4 queue B1 — rotation-collapse discriminators (controls only;
# the big self-sup retrain is queue B2, configured from these results).
#   0. upload-bandwidth probe (documents the 3.1 s/step diagnosis)
#   1. supervised control WITH the deployed aug stack, resumed to 3000
#   2. supervised control WITHOUT augs (skip=1, no flip/interp) 3000
#   3. evals + signed-yaw diagnostics for both
# Serial: ONE TPU process at a time.
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4b1.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4b1.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4b1.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4b1.log
  sleep 15
}

step 900 /tmp/r4_upload.log python -u scripts/probe_upload.py

# --- 1: supervised control WITH augs, resume 550 -> 3000 --------------
for S in 1500 2250 3000; do
  [ -e /tmp/sup_stop ] && break
  step 3000 /tmp/r4_sup_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
    --tag r4 --leg_until $S
done
step 2400 /tmp/r4_sup_eval2.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4
step 2400 /tmp/r4_sup_eval2_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4 --ckpt_step best
step 2400 /tmp/r4_sup_diag2.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=r4

# --- 2: supervised control WITHOUT augs -------------------------------
for S in 1500 3000; do
  [ -e /tmp/sup_stop ] && break
  step 3000 /tmp/r4_supna_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
    --tag r4noaug --no_aug --leg_until $S
done
step 2400 /tmp/r4_supna_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4noaug
step 2400 /tmp/r4_supna_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag r4noaug \
  --ckpt_step best
step 2400 /tmp/r4_supna_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=r4noaug

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4b1.log 2>&1
echo "$(date +%H:%M:%S) R4B1 QUEUE DONE" >> /tmp/tpu_r4b1.log
