#!/bin/bash
# Round-2 TPU work queue: runs after the pillar 10k training legs
# finish.  One TPU process at a time; short settle pauses between
# processes (a just-exited process can hold the device ~1 min).
set -x
cd /root/repo

wait_legs() {
  # wait until the training legs marker appears
  while ! grep -q "ALL LEGS DONE" /tmp/proxy_train_pillar10k.log; do
    sleep 60
  done
}

wait_legs
sleep 90

# 1. evaluate the self-supervised pillar run (t_rel/r_rel/ATE table row)
timeout 3600 python -u scripts/accuracy_proxy.py eval \
  --middle PillarMiddleCov > /tmp/proxy_eval_pillar10k.log 2>&1
sleep 60

# 2. validate + microbench the fused Pallas band conv on the chip
timeout 3600 python -u scripts/check_band_pallas.py \
  > /tmp/band_pallas_check.log 2>&1
sleep 60

# 3. SparseMiddleCov two-frame forward fps with the band engine
RSLO_MIDDLE_ENGINE=band timeout 5400 python -u scripts/profile_forward.py \
  sparse > /tmp/sparse_band_fwd.log 2>&1
sleep 60

# 4. launch the sparse accuracy training, warm-started from the pillar
#    run (vfe/odom/loss alphas transfer; middle net fresh), in legs to
#    sidestep the tunnel-client host-RAM growth.
for S in 1000 2000 3000; do
  echo "=== sparse leg to $S ===" >> /tmp/proxy_train_sparse.log
  timeout 14400 python -u scripts/accuracy_proxy.py train \
    --middle SparseMiddleCov --steps $S \
    --init_from /tmp/rslo_proxy/model_PillarMiddleCov \
    >> /tmp/proxy_train_sparse.log 2>&1 || {
      echo "sparse leg $S failed rc=$?" >> /tmp/proxy_train_sparse.log
      break
    }
  sleep 60
done
echo "TPU QUEUE DONE"
