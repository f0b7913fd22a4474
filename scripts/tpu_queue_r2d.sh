#!/bin/bash
# Round-2 TPU queue, stage 4: band-engine TPU validation + microbench
# retry (after the alignment fix), then sparse band forward fps.
set -x
cd /root/repo
while ! grep -q "TPU QUEUE 3 DONE" /tmp/tpu_queue_r2c.log 2>/dev/null; do
  sleep 60
done
sleep 90
timeout 5400 python -u scripts/check_band_pallas.py \
  > /tmp/band_pallas_check2.log 2>&1
sleep 60
RSLO_MIDDLE_ENGINE=band timeout 5400 python -u scripts/profile_forward.py \
  sparse > /tmp/sparse_band_fwd2.log 2>&1
sleep 60
# rulebook engine reference number on the same build
RSLO_MIDDLE_ENGINE=rulebook timeout 5400 python -u \
  scripts/profile_forward.py sparse > /tmp/sparse_rb_fwd2.log 2>&1
echo "TPU QUEUE 4 DONE"
