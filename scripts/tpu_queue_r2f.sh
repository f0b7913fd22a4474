#!/bin/bash
# Round-2 TPU queue, stage 6: pillar self-sup retrain WITH magnitude-
# diversity augmentation (random_skip + slerp pose-interp), tagged
# "aug", then eval.  Tests the diag_pairtypes fix end to end.
# Legs share one 6000-step schedule via --leg_until.
set -x
cd /root/repo
while ! grep -q "TPU QUEUE 5 DONE" /tmp/tpu_queue_r2e.log 2>/dev/null; do
  sleep 60
done
sleep 90
for S in 3000 6000; do
  echo "=== aug leg to $S ===" >> /tmp/proxy_train_aug.log
  timeout 14400 python -u scripts/accuracy_proxy.py train \
    --middle PillarMiddleCov --steps 6000 --leg_until $S --remat 0 \
    --tag aug >> /tmp/proxy_train_aug.log 2>&1 || {
      echo "aug leg $S failed rc=$?" >> /tmp/proxy_train_aug.log; break; }
  sleep 60
done
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --tag aug > /tmp/proxy_eval_aug.log 2>&1
echo "TPU QUEUE 6 DONE"
