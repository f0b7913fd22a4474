#!/bin/bash
# Round-3 queue G (fresh container after the r3f reset): re-land the
# lost r3e perf block — post-compaction plan-build split, band dispatch
# decision (min_channels 0 vs 64), sparse + full bench on the warm
# remote-compile cache.  Serial: ONE TPU process at a time.
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3g.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3g.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3g.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3g.log
  sleep 15
}

# 1. band stage split with the optimized plan build (the key number)
step 2400 /tmp/band_stages_r3g.log python -u scripts/profile_band_stages.py
# 2. dispatch decision: sparse bench, band engine, both thresholds
step 2400 /tmp/bench_sparse_mc64.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  python -u bench.py
step 2400 /tmp/bench_sparse_mc0.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  RSLO_BAND_MIN_CHANNELS=0 python -u bench.py
# 3. plan-build internals split (where the remaining ms live)
step 2400 /tmp/geom_r3g.log python -u scripts/profile_geometry.py
# 4. full default bench (pillar headline + streaming) on cold container
step 3000 /tmp/bench_r3g_full.log \
  env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R3G QUEUE DONE" >> /tmp/tpu_r3g.log
