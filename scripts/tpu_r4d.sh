#!/bin/bash
# Round-4 queue D — endgame: long self-sup on v3 + loops + sparse row +
# perf block + final bench.  Config knobs via env:
#   R4D_QUANT=0      -> add --no_quantize to train legs (if isolation B
#                       showed quantization blocks rotation)
#   R4D_STEPS=NNNN   -> self-sup schedule length (default 12000)
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v3
rm -f /tmp/queue_stop
QFLAG=""
[ "${R4D_QUANT:-1}" = "0" ] && QFLAG="--no_quantize"
STEPS="${R4D_STEPS:-12000}"
H=$((STEPS / 2))

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4d.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4d.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4d.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4d.log
  sleep 15
}

# --- 1: pillar self-sup ------------------------------------------------
for S in $H $STEPS; do
  [ -e /tmp/aug_stop ] && break
  step 4200 /tmp/r4d_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps $STEPS --leg_until $S \
    --remat 0 --tag r4 $QFLAG --steps_per_eval 1500
  cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r4 .proxy_store/v3/ 2>/dev/null
done

# --- 2: evals ----------------------------------------------------------
step 2400 /tmp/r4d_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4
step 2400 /tmp/r4d_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --ckpt_step best
step 3000 /tmp/r4d_eval_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --refine --refine_loops
step 2400 /tmp/r4d_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=r4

# --- 3: sparse (band) matched-ish row (time-gated) ---------------------
if [ "$(date +%H%M)" -lt 1620 ]; then
  for S in 2250 4500; do
    [ -e /tmp/sparse_stop ] && break
    step 4200 /tmp/r4d_sparse_leg$S.log python -u scripts/accuracy_proxy.py \
      train --middle SparseMiddleCov --steps 4500 --leg_until $S \
      --engine band --tag r4 $QFLAG --steps_per_eval 1500
  done
  step 2400 /tmp/r4d_sparse_eval.log python -u scripts/accuracy_proxy.py \
    eval --middle SparseMiddleCov --engine band --tag r4
fi

# --- 4: perf block -----------------------------------------------------
step 1800 /tmp/r4_gather.log python -u scripts/probe_gather.py
step 2400 /tmp/r4_plan_lookup2.log python -u scripts/profile_plan_lookup.py

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4.log 2>&1
step 2400 /tmp/bench_r4.log env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R4D QUEUE DONE" >> /tmp/tpu_r4d.log
