#!/bin/bash
# Round-3 queue E — profiling + sparse-speed block, run between r3d's
# phase 1 (pillar aug2) and the sparse aug2 training.  Decides the
# band-engine routing (band_min_channels) with the optimized plan build
# (cumsum+searchsorted compaction, cond-gated overflow) and re-benches.
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r3e.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r3e.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r3e.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r3e.log
  sleep 15
}

# geometry/plan-build stage split (optimized compaction)
step 2400 /tmp/geom_r3e.log python -u scripts/profile_geometry.py
# NN kernel tile sweep (layout fix)
step 1800 /tmp/nn_r3e.log python -u scripts/profile_nn.py
# band kernel microbench (bit-exactness + per-C timing, new plan build)
step 1800 /tmp/band_check_r3e.log python -u scripts/check_band_pallas.py
# band stage split with the optimized plan build
step 2400 /tmp/band_stages_r3e.log python -u scripts/profile_band_stages.py
# block/window sweep (per-tap latency amortization)
step 2400 /tmp/band_tiles_r3e.log python -u scripts/profile_band_tiles.py
# sparse bench: band engine, dispatch variants
step 2400 /tmp/bench_sparse_mc64.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  python -u bench.py
step 2400 /tmp/bench_sparse_mc0.log \
  env RSLO_BENCH_MIDDLE=SparseMiddleCov RSLO_BENCH_ENGINE=band \
  RSLO_BAND_MIN_CHANNELS=0 python -u bench.py
# does the sparse train step fit without remat? (pillar: 592->489 ms)
step 2400 /tmp/sparse_remat_probe.log \
  python -u scripts/sparse_remat_probe.py
echo "$(date +%H:%M:%S) R3E QUEUE DONE" >> /tmp/tpu_r3e.log
