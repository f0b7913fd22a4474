#!/bin/bash
# Round-4 queue B — the accuracy round proper.
#   0. upload-bandwidth probe (documents the 3.1 s/step diagnosis)
#   1. pillar self-sup retrain, tag r4, FULL 9000-step OneCycle on the
#      world-v2 store, fixed augs + quantized transfer (expect ~4x
#      faster legs than r3d)
#   2. in-situ pseudo-target quality (diag_pseudo) mid-training
#   3. evals: final, best ckpt, loop-closure refine
#   4. rotation diagnostics (diag_preds) on the final model
#   5. matched-budget sparse (band engine) to 4500 steps + eval
#   6. final dual bench with streaming fields
# Serial: ONE TPU process at a time.  Touch /tmp/queue_stop to end at
# the next step boundary.
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4b.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4b.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4b.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4b.log
  sleep 15
}

step 900 /tmp/r4_upload.log python -u scripts/probe_upload.py

# --- finish the supervised control (r4a's leg stalled at s550 on a
# --- tunnel hang; quantized transfer makes the rest ~40 min) ----------
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

# --- pillar self-sup retrain (tag r4) ---------------------------------
for S in 1500 3000 4500 6000 7500 9000; do
  [ -e /tmp/aug_stop ] && break
  step 3000 /tmp/r4_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 9000 --leg_until $S \
    --remat 0 --tag r4
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_r4 .proxy_store/ 2>/dev/null
  if [ "$S" = "3000" ]; then
    step 2400 /tmp/r4_pseudo.log python -u scripts/diag_pseudo.py \
      PillarMiddleCov 8 --tag=r4
  fi
done

# --- evals -------------------------------------------------------------
step 2400 /tmp/r4_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4
step 2400 /tmp/r4_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --ckpt_step best
step 3000 /tmp/r4_eval_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --refine --refine_loops
step 2400 /tmp/r4_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=r4

# --- matched-budget sparse (band engine) -------------------------------
for S in 750 1500 2250 3000 3750 4500; do
  [ -e /tmp/sparse_stop ] && break
  step 3000 /tmp/r4_sparse_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 4500 --leg_until $S \
    --engine band --tag r4
  cp -r /tmp/rslo_proxy/model_SparseMiddleCov_r4 .proxy_store/ 2>/dev/null
done
step 2400 /tmp/r4_sparse_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4
step 2400 /tmp/r4_sparse_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4 --ckpt_step best

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4.log 2>&1
step 2400 /tmp/bench_r4.log env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R4B QUEUE DONE" >> /tmp/tpu_r4b.log
