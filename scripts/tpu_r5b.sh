#!/bin/bash
# Round-5 queue B — the accuracy headline re-land (VERDICT r4 next #2/#3/#7):
# train PillarMiddleCov FROM SCRATCH on the v4 store with the new
# global-yaw augmentation, 25k steps (production-scale soak, legs of
# ~8k so each process exits at a checkpoint boundary before the tunnel
# RSS leak or a stall can hurt), periodic evals every 1500 steps feed
# best-ckpt preserve(); then ONE eval leg on the BEST checkpoint with
# --refine --refine_loops (chained/refined/loop_closed rows).
# Evidence mirrors into .round5_logs/ + results into .proxy_store/v4.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v4
export RSLO_PROXY_SEQSET=v4
rm -f /tmp/queue_stop
LOG=/tmp/tpu_r5b.log
mkdir -p .round5_logs .proxy_store/v4 results

NOW=$(date +%s)
TRAIN_END=$(( NOW + ${R5B_TRAIN_BUDGET:-14400} ))
EVAL_END=$(( TRAIN_END + ${R5B_EVAL_BUDGET:-3600} ))

# log mirror: evidence survives even if the driver kills us mid-leg
(
  while true; do
    cp /tmp/r5b_*.log /tmp/tpu_r5b.log /root/repo/.round5_logs/ 2>/dev/null
    cp $RSLO_PROXY_ROOT/result_*.json /root/repo/.round5_logs/ 2>/dev/null
    sleep 120
  done
) &
MIRROR_PID=$!
trap "kill $MIRROR_PID 2>/dev/null" EXIT

step() {  # step <end_epoch> <log> <cmd...>
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> $LOG; exit 0
  fi
  local end="$1" log="$2"; shift 2
  local t=$(( end - $(date +%s) ))
  if [ "$t" -lt 120 ]; then
    echo "$(date +%H:%M:%S) SKIP (past gate) $log" >> $LOG; return
  fi
  echo "$(date +%H:%M:%S) START(${t}s) $log" >> $LOG
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> $LOG
  echo "$(date +%H:%M:%S) END $log" >> $LOG
  sleep 10
}

[ -f $RSLO_PROXY_ROOT/proxy.h5 ] || { echo "NO STORE" >> $LOG; exit 1; }

# 1. train legs (scratch, yaw-aug on via accuracy_proxy base_cfg);
#    each leg resumes from the last checkpoint; a retry inside each
#    target absorbs one tunnel stall.
for until in 8000 16000 25000; do
  for i in 1 2; do
    [ -e /tmp/queue_stop ] && break 2
    # skip the retry if the leg already reached its target
    last=$(ls $RSLO_PROXY_ROOT/model_PillarMiddleCov_r5b/ckpt 2>/dev/null \
           | grep -E '^[0-9]+$' | sort -n | tail -1)
    [ "${last:-0}" -ge "$until" ] && break
    step $TRAIN_END /tmp/r5b_leg${until}_$i.log \
      python -u scripts/accuracy_proxy.py train \
        --middle PillarMiddleCov --steps 25000 --remat 0 --tag r5b \
        --steps_per_eval 1500 --leg_until $until
    cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r5b .proxy_store/v4/ 2>/dev/null
  done
done

# 2. one eval leg: chained + refined + loop_closed on the BEST ckpt
step $EVAL_END /tmp/r5b_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r5b --ckpt_step best \
  --refine --refine_loops

# 3. report + stash results INTO THE REPO (driver commits stragglers)
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r5b.log 2>&1
cp /tmp/proxy_report_r5b.log /root/repo/.round5_logs/proxy_report.txt 2>/dev/null
cp /tmp/proxy_report_r5b.log /root/repo/results/proxy_report_r5b.txt 2>/dev/null
cp $RSLO_PROXY_ROOT/result_*.json /root/repo/results/ 2>/dev/null
cp $RSLO_PROXY_ROOT/result_*.json /root/repo/.proxy_store/v4/ 2>/dev/null
cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r5b .proxy_store/v4/ 2>/dev/null
echo "$(date +%H:%M:%S) R5B QUEUE DONE" >> $LOG
