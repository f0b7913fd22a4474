#!/bin/bash
# Round-2 continuation queue (fresh container: /tmp and the local jax
# cache were wiped; the remote compile service should still be warm).
# Order: quick insurance artifacts first, then the sparse-band bench
# number (VERDICT r1 #2 done-criterion), then aug accuracy legs until
# /tmp/aug_stop appears.  Touch /tmp/queue_stop to end at the next
# step boundary.
set -x
cd /root/repo

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_sess3.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_sess3.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_sess3.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_sess3.log
  sleep 20   # let an exited process release the device
}

# --- 1. insurance + the sparse band number ----------------------------
step 1800 /tmp/bench_pillar.log python -u bench.py
step 2400 /tmp/bench_sparse_band.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band  \
  python -u bench.py
step 1800 /tmp/band_pallas_check.log python -u scripts/check_band_pallas.py

# --- 2. aug accuracy legs (wait for the store) ------------------------
for i in $(seq 1 60); do
  [ -f /tmp/rslo_proxy/proxy.h5.done ] && break
  sleep 20
done
if [ -f /tmp/rslo_proxy/proxy.h5.done ]; then
  for S in 750 1500 2250 3000 3750 4500 5250 6000; do
    [ -e /tmp/aug_stop ] && break
    step 900 /tmp/aug_leg$S.log python -u scripts/accuracy_proxy.py \
      train --middle PillarMiddleCov --steps 9000 --leg_until $S \
      --remat 0 --tag aug
  done
  step 1200 /tmp/eval_aug.log python -u scripts/accuracy_proxy.py \
    eval --middle PillarMiddleCov --tag aug
  step 1200 /tmp/eval_aug_best.log python -u scripts/accuracy_proxy.py \
    eval --middle PillarMiddleCov --tag aug --ckpt_step best
fi
echo "$(date +%H:%M:%S) SESS3 QUEUE DONE" >> /tmp/tpu_sess3.log
