#!/bin/bash
# Round-4 queue B2 — the long self-sup run + matched sparse + bench.
# Preconditions: B1 done (controls + diagnostics).
#   0. perf block: gather-formulation probe + plan-lookup A/B with the
#      new slot_planes method
#   1. pillar self-sup, tag r4, steps=30000 (the transfer fix makes
#      steps 0.16 s — the 200k-step reference schedule is approachable;
#      r3 evidence says rotation improves slowly but monotonically on
#      val, so the budget IS the lever), legs of 10000
#   2. diag_pseudo after leg 1 (in-situ pseudo-target rotation quality)
#   3. evals: final, best, loop-closure; diag_preds
#   4. sparse (band) self-sup to 9000 + evals (near-matched vs the
#      pillar's 7500-step periodic row)
#   5. final dual bench with streaming fields
set -x
cd /root/repo

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4b2.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4b2.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4b2.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4b2.log
  sleep 15
}

# --- 1: pillar self-sup 30k --------------------------------------------
for S in 10000 20000 30000; do
  [ -e /tmp/aug_stop ] && break
  step 4200 /tmp/r4_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 30000 --leg_until $S \
    --remat 0 --tag r4 --steps_per_eval 1500
  cp -r /tmp/rslo_proxy/model_PillarMiddleCov_r4 .proxy_store/ 2>/dev/null
  if [ "$S" = "10000" ]; then
    step 2400 /tmp/r4_pseudo.log python -u scripts/diag_pseudo.py \
      PillarMiddleCov 8 --tag=r4
  fi
done

# --- 3: evals ----------------------------------------------------------
step 2400 /tmp/r4_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4
step 2400 /tmp/r4_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --ckpt_step best
step 3000 /tmp/r4_eval_loops.log python -u scripts/accuracy_proxy.py \
  eval --middle PillarMiddleCov --tag r4 --refine --refine_loops
step 2400 /tmp/r4_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --tag=r4

# --- 4: sparse (band) to 9000 ------------------------------------------
for S in 4500 9000; do
  [ -e /tmp/sparse_stop ] && break
  step 4200 /tmp/r4_sparse_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle SparseMiddleCov --steps 9000 --leg_until $S \
    --engine band --tag r4 --steps_per_eval 1500
  cp -r /tmp/rslo_proxy/model_SparseMiddleCov_r4 .proxy_store/ 2>/dev/null
done
step 2400 /tmp/r4_sparse_eval.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4
step 2400 /tmp/r4_sparse_eval_best.log python -u scripts/accuracy_proxy.py \
  eval --middle SparseMiddleCov --engine band --tag r4 --ckpt_step best

# --- perf block --------------------------------------------------------
step 1800 /tmp/r4_gather.log python -u scripts/probe_gather.py
step 2400 /tmp/r4_plan_lookup2.log python -u scripts/profile_plan_lookup.py

python scripts/accuracy_proxy.py report > /tmp/proxy_report_r4.log 2>&1
step 2400 /tmp/bench_r4.log env RSLO_BENCH_STREAMING=1 python -u bench.py
echo "$(date +%H:%M:%S) R4B2 QUEUE DONE" >> /tmp/tpu_r4b2.log
