#!/bin/bash
# Round-4 queue E — the endgame accuracy play: warm-start from the v3
# self-sup checkpoint and fine-tune on the v4 store (loop-pattern
# training sequences fix the val-loop OOD rotation shrinkage), then
# evals + loop closure + bench.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v4
export RSLO_PROXY_SEQSET=v4
rm -f /tmp/queue_stop

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4e.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4e.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4e.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4e.log
  sleep 15
}

step 4200 /tmp/r4e_leg.log python -u scripts/accuracy_proxy.py \
  train --middle PillarMiddleCov --steps 3000 --remat 0 --tag r4v4 \
  --init_from /tmp/rslo_proxy_v3/model_PillarMiddleCov_r4 \
  --steps_per_eval 1000
cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r4v4 .proxy_store/v4/ 2>/dev/null

step 3000 /tmp/r4e_eval_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4v4 --refine --refine_loops
step 2400 /tmp/r4e_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4v4
step 2400 /tmp/r4e_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4v4 --ckpt_step best
step 2400 /tmp/r4e_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=r4v4

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4e.log 2>&1
step 2400 /tmp/bench_r4.log env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R4E QUEUE DONE" >> /tmp/tpu_r4e.log
