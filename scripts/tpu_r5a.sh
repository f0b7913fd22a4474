#!/bin/bash
# Round-5 queue A — rebuild the round-4 accuracy result after the
# container reset, upgraded: train FROM SCRATCH on the v4 store
# (curves + both-direction loops; supersedes the v3->v4 warm-start
# chain now that the loop-OOD fix is understood), then ONE eval leg
# (--refine --refine_loops reports chained/refined/loop_closed on the
# full 499-window val walk).  Time gates default to a 2h session
# (round-3 precedent); a log-mirror loop copies /tmp evidence into the
# repo every 2 min so an early driver cutoff still commits it.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v4
export RSLO_PROXY_SEQSET=v4
rm -f /tmp/queue_stop
LOG=/tmp/tpu_r5a.log
mkdir -p .round5_logs .proxy_store/v4

TRAIN_END=$(date -d "${R5_TRAIN_END:-19:50}" +%s)
EVAL_END=$(date -d "${R5_EVAL_END:-20:15}" +%s)

# log mirror: evidence survives even if the driver kills us mid-leg
(
  while true; do
    cp /tmp/r5a_*.log /tmp/tpu_r5a.log /root/repo/.round5_logs/ 2>/dev/null
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
  if [ "$t" -lt 60 ]; then
    echo "$(date +%H:%M:%S) SKIP (past gate) $log" >> $LOG; return
  fi
  echo "$(date +%H:%M:%S) START(${t}s) $log" >> $LOG
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> $LOG
  echo "$(date +%H:%M:%S) END $log" >> $LOG
  sleep 10
}

# 0. wait for the store build (r5_build_v4.sh) to land
for i in $(seq 1 240); do
  [ -f $RSLO_PROXY_ROOT/proxy.h5.done ] && break
  sleep 10
done
[ -f $RSLO_PROXY_ROOT/proxy.h5.done ] || { echo "NO STORE" >> $LOG; exit 1; }

# 1. train leg (scratch on v4; checkpoint_interval=250 bounds losses;
#    a second leg resumes if a tunnel stall killed the first early)
for i in 1 2; do
  [ -e /tmp/queue_stop ] && break   # ADVICE r4: one stop sentinel
  step $TRAIN_END /tmp/r5a_leg$i.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps ${R5_STEPS:-5250} --remat 0 --tag r5 \
    --steps_per_eval 1500
  cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r5 .proxy_store/v4/ 2>/dev/null
done

# 2. one eval leg: chained + refined + loop_closed, full val walk
step $EVAL_END /tmp/r5a_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r5 --refine --refine_loops

# 3. report + stash results INTO THE REPO (driver commits stragglers)
python scripts/accuracy_proxy.py report > /tmp/proxy_report_r5.log 2>&1
cp /tmp/proxy_report_r5.log /root/repo/.round5_logs/proxy_report.txt 2>/dev/null
cp $RSLO_PROXY_ROOT/result_*.json /root/repo/.proxy_store/v4/ 2>/dev/null
cp -r $RSLO_PROXY_ROOT/model_PillarMiddleCov_r5 .proxy_store/v4/ 2>/dev/null
echo "$(date +%H:%M:%S) R5A QUEUE DONE" >> $LOG
