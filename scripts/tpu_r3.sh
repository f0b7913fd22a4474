#!/bin/bash
# Round-3 bootstrap: close the accuracy question with a FULL-ROUND
# training budget.  Lessons encoded from round 2's continuation:
#   - /tmp is wiped between rounds: restore the proxy store from the
#     in-repo stash (.proxy_store/, untracked) if it survived, else
#     rebuild with one render process PER SEQUENCE (3x parallel,
#     ~12 min vs ~35 min serial on the 4-vCPU host).
#   - Start the store restore + first TPU artifact IMMEDIATELY; every
#     train leg is short (900 s) so a driver bench never waits long.
#   - Train the aug pillar model in legs to >=5250 steps (the un-aug
#     run's best val was s5625), then eval final + best.
# Touch /tmp/queue_stop to end at the next step boundary.
set -x
cd /root/repo

step() {  # step <timeout_s> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3.log
  sleep 20
}

# --- 0. proxy store: restore stash or parallel rebuild (CPU) ----------
(
  mkdir -p /tmp/rslo_proxy
  if [ -f .proxy_store/proxy.h5 ] \
     && cp .proxy_store/proxy.h5 /tmp/rslo_proxy/ \
     && cp .proxy_store/gt_poses_*.npz /tmp/rslo_proxy/; then
    # checkpoint stash is optional; store restore is not
    cp -r .proxy_store/model_PillarMiddleCov_aug /tmp/rslo_proxy/ 2>/dev/null
    touch /tmp/rslo_proxy/proxy.h5.done
    echo "restored store from .proxy_store" >> /tmp/tpu_r3.log
  else
    for s in 0 1 7; do
      python -u scripts/accuracy_proxy.py build --seqs $s \
        > /tmp/build_seq$s.log 2>&1 &
    done
    wait
    python -u scripts/accuracy_proxy.py build --h5_only \
      > /tmp/build_h5.log 2>&1
    touch /tmp/rslo_proxy/proxy.h5.done
  fi
) &
STORE_PID=$!

# --- 1. quick TPU insurance while the store lands ---------------------
step 1800 /tmp/bench_r3.log python -u bench.py
step 900 /tmp/band_stages_r3.log python -u scripts/profile_band_stages.py

wait $STORE_PID

# --- 2. aug accuracy legs (resumes any stashed checkpoint) ------------
for S in 750 1500 2250 3000 3750 4500 5250 6000 6750 7500; do
  [ -e /tmp/aug_stop ] && break
  step 900 /tmp/aug_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 9000 --leg_until $S \
    --remat 0 --tag aug
  # stash the ckpt for the next round after every leg
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_aug .proxy_store/ 2>/dev/null
done
step 1200 /tmp/eval_aug.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug
step 1200 /tmp/eval_aug_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag aug --ckpt_step best
step 1200 /tmp/diag_pairtypes_aug.log python -u scripts/diag_pairtypes.py \
  PillarMiddleCov 6 --tag=aug
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r3.log 2>&1
echo "$(date +%H:%M:%S) R3 QUEUE DONE" >> /tmp/tpu_r3.log
