#!/bin/bash
# Consolidated round-2 TPU recovery queue (replaces stages 1-7 after
# the remote-compile outage).  Waits for the tunnel to come back, then
# drives the remaining work in priority order.  Each step is
# independently timeout'd; failures don't block later steps.
set -x
cd /root/repo

probe() {
  timeout 300 python -u -c "
import jax, numpy as np, jax.numpy as jnp
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((256, 256)))
print('ok', float(np.asarray(x).sum()))" > /tmp/tpu_probe.log 2>&1
}

until probe; do
  echo "$(date +%H:%M) tunnel still down" >> /tmp/tpu_night.log
  sleep 240
done
echo "$(date +%H:%M) tunnel healthy" >> /tmp/tpu_night.log

# --- 1. finish sparse accuracy legs (2000, 3000) ---------------------
for S in 2000 3000; do
  echo "=== sparse leg to $S ===" >> /tmp/proxy_train_sparse.log
  timeout 10800 python -u scripts/accuracy_proxy.py train \
    --middle SparseMiddleCov --steps 3000 --leg_until $S \
    --init_from /tmp/rslo_proxy/model_PillarMiddleCov \
    >> /tmp/proxy_train_sparse.log 2>&1 || \
    echo "sparse leg $S failed" >> /tmp/tpu_night.log
  sleep 60
done

# --- 2. aug pillar retrain (the magnitude fix under test) ------------
for S in 3000 6000; do
  echo "=== aug leg to $S ===" >> /tmp/proxy_train_aug.log
  timeout 14400 python -u scripts/accuracy_proxy.py train \
    --middle PillarMiddleCov --steps 6000 --leg_until $S --remat 0 \
    --tag aug >> /tmp/proxy_train_aug.log 2>&1 || \
    echo "aug leg $S failed" >> /tmp/tpu_night.log
  sleep 60
done

# --- 3. evals -----------------------------------------------------
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --tag aug > /tmp/proxy_eval_aug.log 2>&1
sleep 60
timeout 5400 python -u scripts/accuracy_proxy.py eval \
  --middle SparseMiddleCov > /tmp/proxy_eval_sparse.log 2>&1
sleep 60
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --supervised \
  > /tmp/proxy_eval_pillar_sup.log 2>&1
sleep 60
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --ckpt_step 5625 \
  > /tmp/proxy_eval_pillar_best.log 2>&1
sleep 60

# --- 4. band engine validation + fps ---------------------------------
timeout 5400 python -u scripts/check_band_pallas.py \
  > /tmp/band_pallas_check2.log 2>&1
sleep 60
RSLO_MIDDLE_ENGINE=band timeout 5400 python -u scripts/profile_forward.py \
  sparse > /tmp/sparse_band_fwd2.log 2>&1
sleep 60
RSLO_MIDDLE_ENGINE=rulebook timeout 5400 python -u \
  scripts/profile_forward.py sparse > /tmp/sparse_rb_fwd2.log 2>&1
sleep 60

# --- 5. refinement rows + diagnostics + breakdown + final bench ------
timeout 5400 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --tag aug --refine_loops \
  > /tmp/proxy_eval_aug_loops.log 2>&1
sleep 60
timeout 3600 python -u scripts/diag_pairtypes.py PillarMiddleCov 6 --tag=aug \
  > /tmp/diag_pairtypes_aug.log 2>&1 || true
sleep 60
timeout 7200 python -u scripts/profile_train_breakdown.py pillar 3 \
  > /tmp/train_breakdown_pillar.log 2>&1
sleep 60
timeout 7200 python -u bench.py > /tmp/bench_r2_final.log 2>&1
python scripts/accuracy_proxy.py report > /tmp/proxy_report_final.log 2>&1
echo "TPU NIGHT DONE"
