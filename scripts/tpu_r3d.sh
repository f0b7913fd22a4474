#!/bin/bash
# Round-3 queue D — retrain with the flip/pose_seq augmentation fix
# (rotation-collapse root cause: random_flip_y left pose_seq unflipped,
# so pose_interp_aug regenerated mirror-inconsistent rotation targets
# and warps on ~50% of samples).  Tag: aug2.
#
# Touch /tmp/queue_stop to end at the next step boundary;
# /tmp/aug2_stop | /tmp/sparse2_stop skip the remaining legs of a phase.
set -x
cd /root/repo

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3d.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3d.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3d.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3d.log
  sleep 20
}

# --- 1: pillar aug2 accuracy legs (fixed flip aug, full schedule) -----
for S in 1500 3000 4500 6000 7500 9000; do
  [ -e /tmp/aug2_stop ] && break
  step 2700 /tmp/aug2_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 9000 --leg_until $S \
    --remat 0 --tag aug2
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_aug2 .proxy_store/ 2>/dev/null
done
step 2400 /tmp/eval_aug2.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug2
step 2400 /tmp/eval_aug2_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug2 --ckpt_step best
step 1200 /tmp/diag_preds_aug2.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=aug2
step 1200 /tmp/diag_pairtypes_aug2.log python -u scripts/diag_pairtypes.py \
  PillarMiddleCov 6 --tag=aug2
step 2400 /tmp/eval_aug2_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug2 --refine_loops

# --- 2: matched-budget sparse aug2 (band engine) to 4500 --------------
for S in 1125 2250 3375 4500; do
  [ -e /tmp/sparse2_stop ] && break
  step 3000 /tmp/sparse2_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 4500 --leg_until $S \
    --engine band --tag aug2
  cp -r /tmp/rslo_proxy/model_SparseMiddleCov_aug2 .proxy_store/ 2>/dev/null
done
step 2400 /tmp/eval_sparse_aug2.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug2
step 2400 /tmp/eval_sparse_aug2_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag aug2 --ckpt_step best

# --- 3: final dual-line bench (+streaming row) + report ---------------
step 3000 /tmp/bench_r3d_final.log \
  env RSLO_BENCH_STREAMING=1 python -u bench.py
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r3d.log 2>&1
cp /tmp/proxy_report_r3d.log .proxy_store/ 2>/dev/null
echo "$(date +%H:%M:%S) R3D QUEUE DONE" >> /tmp/tpu_r3d.log
