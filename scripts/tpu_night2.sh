#!/bin/bash
# Round-2 TPU queue v2 (replaces tpu_night.sh): reordered so the
# quick, high-value artifacts land FIRST once the tunnel returns
# (bench insurance, band-kernel validation, honest-fps evals), and
# training runs in SHORT legs so a driver-initiated bench.py never
# waits behind a multi-hour device hold.  Steps are independently
# timeout'd; failures don't block later steps.  Touch
# /tmp/queue_stop to end the queue at the next step boundary.
set -x
cd /root/repo

probe() {
  timeout 300 python -u -c "
import jax, numpy as np, jax.numpy as jnp
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((256, 256)))
print('ok', float(np.asarray(x).sum()))" > /tmp/tpu_probe.log 2>&1
}

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M) queue_stop sentinel — exiting" >> /tmp/tpu_night.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M) START $log" >> /tmp/tpu_night.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M) FAILED($?) $log" >> /tmp/tpu_night.log
  echo "$(date +%H:%M) END $log" >> /tmp/tpu_night.log
  sleep 60   # let a killed/exited process release the device
}

until probe; do
  echo "$(date +%H:%M) tunnel still down" >> /tmp/tpu_night.log
  sleep 240
done
echo "$(date +%H:%M) tunnel healthy" >> /tmp/tpu_night.log

# --- 1. fast insurance artifacts --------------------------------------
step 5400 /tmp/bench_r2_early.log python -u bench.py
step 5400 /tmp/band_pallas_check2.log python -u scripts/check_band_pallas.py
step 5400 /tmp/sparse_band_fwd2.log \
  env RSLO_MIDDLE_ENGINE=band python -u scripts/profile_forward.py sparse
step 5400 /tmp/sparse_rb_fwd2.log \
  env RSLO_MIDDLE_ENGINE=rulebook python -u scripts/profile_forward.py sparse

# --- 2. honest-fps evals of existing checkpoints ----------------------
step 3600 /tmp/proxy_eval_pillar_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --ckpt_step 5625

# --- 3. aug pillar retrain (the magnitude fix under test), short legs -
for S in 1500 3000 4500 6000 7500 9000; do
  echo "=== aug leg to $S ===" >> /tmp/proxy_train_aug.log
  step 7200 /tmp/proxy_train_aug_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 9000 --leg_until $S --remat 0 --tag aug
  cat /tmp/proxy_train_aug_leg$S.log >> /tmp/proxy_train_aug.log
done
step 3600 /tmp/proxy_eval_aug.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug
step 3600 /tmp/proxy_eval_aug_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug --ckpt_step best
step 3600 /tmp/diag_pairtypes_aug.log python -u scripts/diag_pairtypes.py \
  PillarMiddleCov 6 --tag=aug

# --- 4. sparse accuracy legs ------------------------------------------
for S in 1500 2000 2500 3000; do
  echo "=== sparse leg to $S ===" >> /tmp/proxy_train_sparse.log
  step 7200 /tmp/proxy_train_sparse_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 3000 --leg_until $S \
    --init_from /tmp/rslo_proxy/model_PillarMiddleCov
  cat /tmp/proxy_train_sparse_leg$S.log >> /tmp/proxy_train_sparse.log
done
step 5400 /tmp/proxy_eval_sparse.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov

# --- 5. refinement row + breakdown + final bench ----------------------
step 5400 /tmp/proxy_eval_aug_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug --refine_loops
step 7200 /tmp/train_breakdown_pillar.log python -u \
  scripts/profile_train_breakdown.py pillar 3
step 7200 /tmp/bench_r2_final.log python -u bench.py
python scripts/accuracy_proxy.py report > /tmp/proxy_report_final.log 2>&1

# --- 6. bonus (time permitting): world-v2 retrain ---------------------
# The varied-speed world (data-level magnitude diversity). Only runs if
# the CPU-side v2 build finished.
if [ -f /tmp/rslo_proxy_v2/proxy.h5 ]; then
  for S in 2250 4500 6750 9000; do
    step 7200 /tmp/proxy_v2_train_leg$S.log \
      env RSLO_PROXY_ROOT=/tmp/rslo_proxy_v2 python -u \
      scripts/accuracy_proxy.py train --middle PillarMiddleCov \
      --steps 9000 --leg_until $S --remat 0
  done
  step 3600 /tmp/proxy_v2_eval.log \
    env RSLO_PROXY_ROOT=/tmp/rslo_proxy_v2 python -u \
    scripts/accuracy_proxy.py eval --middle PillarMiddleCov
  step 3600 /tmp/proxy_v2_eval_best.log \
    env RSLO_PROXY_ROOT=/tmp/rslo_proxy_v2 python -u \
    scripts/accuracy_proxy.py eval --middle PillarMiddleCov --ckpt_step best
  env RSLO_PROXY_ROOT=/tmp/rslo_proxy_v2 python \
    scripts/accuracy_proxy.py report > /tmp/proxy_report_v2.log 2>&1
fi
echo "TPU NIGHT2 DONE"
