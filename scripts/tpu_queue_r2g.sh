#!/bin/bash
# Round-2 TPU queue, stage 7: best-checkpoint evals (model selection by
# the periodic val metric, the reference's eval_once pattern).
set -x
cd /root/repo
while ! grep -q "TPU QUEUE 6 DONE" /tmp/tpu_queue_r2f.log 2>/dev/null; do
  sleep 60
done
sleep 90
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --ckpt_step 5625 \
  > /tmp/proxy_eval_pillar_best.log 2>&1
sleep 60
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --supervised --ckpt_step 2250 \
  > /tmp/proxy_eval_sup_best.log 2>&1
sleep 60
python scripts/accuracy_proxy.py report > /tmp/proxy_report_final.log 2>&1
echo "TPU QUEUE 7 DONE"
