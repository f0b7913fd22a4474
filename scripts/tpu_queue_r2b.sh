#!/bin/bash
# Round-2 TPU work queue, stage 2: runs after tpu_queue_r2.sh prints
# its DONE marker.  Remaining evals + train-step breakdown + final
# bench.
set -x
cd /root/repo

while ! grep -q "TPU QUEUE DONE" /tmp/tpu_queue_r2.log 2>/dev/null; do
  sleep 60
done
sleep 90

# 1. supervised pillar row of the accuracy table
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --supervised \
  > /tmp/proxy_eval_pillar_sup.log 2>&1
sleep 60

# 2. sparse row (training must have finished in stage 1)
timeout 5400 python -u scripts/accuracy_proxy.py eval \
  --middle SparseMiddleCov > /tmp/proxy_eval_sparse.log 2>&1
sleep 60

# 3. refinement rows on the best self-sup pillar model: windowed PGO
#    fusion and loop closures (val seq 7 is a loop trajectory)
timeout 5400 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --refine \
  > /tmp/proxy_eval_pillar_refine.log 2>&1
sleep 60
timeout 5400 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov --refine_loops \
  > /tmp/proxy_eval_pillar_loops.log 2>&1
sleep 60

# 4. train-step cost breakdown (VERDICT r1 next #10)
timeout 7200 python -u scripts/profile_train_breakdown.py pillar 3 \
  > /tmp/train_breakdown_pillar.log 2>&1
sleep 60

# 5. final headline bench
timeout 7200 python -u bench.py > /tmp/bench_r2_final.log 2>&1

echo "TPU QUEUE 2 DONE"
