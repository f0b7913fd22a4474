#!/bin/bash
# Round-2 TPU queue, stage 3: translation diagnostics on the trained
# 10k self-sup pillar model (runs after stage 2).
set -x
cd /root/repo
while ! grep -q "TPU QUEUE 2 DONE" /tmp/tpu_queue_r2b.log 2>/dev/null; do
  sleep 60
done
sleep 90
timeout 3600 python -u scripts/diag_sensitivity.py PillarMiddleCov \
  > /tmp/diag_sens_10k.log 2>&1
sleep 60
timeout 3600 python -u scripts/diag_preds.py PillarMiddleCov \
  > /tmp/diag_preds_10k.log 2>&1
echo "TPU QUEUE 3 DONE"
