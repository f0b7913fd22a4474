#!/bin/bash
# Round-3 queue F — after r3d (pillar aug2) and r3e (profiling/bench):
#   1. scene-generalization eval: pillar aug2 checkpoint scored on the
#      world_seed=1 val-only store (unseen scene content)
#   2. matched-budget sparse aug2 training (band engine) to 4500 steps
#      — compare against pillar aug2's periodic eval at 4500
#   3. sparse evals + final dual-line bench + report
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3f.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3f.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3f.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3f.log
  sleep 15
}

# --- 1: scene-generalization probe ------------------------------------
if [ -e /tmp/rslo_proxy_gen/proxy.h5 ]; then
  mkdir -p /tmp/rslo_proxy_gen/model_PillarMiddleCov_aug2
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_aug2/ckpt \
        /tmp/rslo_proxy_gen/model_PillarMiddleCov_aug2/ 2>/dev/null
  cp /tmp/rslo_proxy/model_PillarMiddleCov_aug2/best_ckpt.json \
        /tmp/rslo_proxy_gen/model_PillarMiddleCov_aug2/ 2>/dev/null
  step 2400 /tmp/eval_aug2_genworld.log \
    env RSLO_PROXY_ROOT=/tmp/rslo_proxy_gen \
    python -u scripts/accuracy_proxy.py eval --middle PillarMiddleCov \
    --tag aug2
fi

# --- 1b: rotation diagnostics + supervised control --------------------
# yaw corr/ratio on val (did the model learn rotation at all?)
step 2400 /tmp/diag_preds_aug2b.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=aug2
step 2400 /tmp/diag_pairtypes_aug2b.log python -u scripts/diag_pairtypes.py \
  PillarMiddleCov 6 --tag=aug2
# supervised control on world v2: discriminates "world/input issue"
# (control also fails val rotation) from "self-sup objective issue"
step 2700 /tmp/sup_ctrl_train.log python -u scripts/accuracy_proxy.py \
  train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
  --tag aug2
step 2400 /tmp/sup_ctrl_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --supervised --tag aug2

# --- 2: matched-budget sparse aug2 (band engine) ----------------------
for S in 1125 2250 3375 4500; do
  [ -e /tmp/sparse3_stop ] && break
  step 3300 /tmp/sparse3_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 4500 --leg_until $S \
    --engine band --tag aug2
  cp -r /tmp/rslo_proxy/model_SparseMiddleCov_aug2 .proxy_store/ 2>/dev/null
done
step 2400 /tmp/eval_sparse_aug2.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug2
step 2400 /tmp/eval_sparse_aug2_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug2 --ckpt_step best

# --- 3: final dual-line bench (+streaming) + report -------------------
step 3000 /tmp/bench_r3f_final.log \
  env RSLO_BENCH_STREAMING=1 python -u bench.py
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r3f.log 2>&1
cp /tmp/proxy_report_r3f.log .proxy_store/ 2>/dev/null
echo "$(date +%H:%M:%S) R3F QUEUE DONE" >> /tmp/tpu_r3f.log
