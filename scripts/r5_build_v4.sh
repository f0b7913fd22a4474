#!/bin/bash
# Round-5 store rebuild: v4 seqset (curves + both-direction loops),
# urban speed profile (world v3 statistics).  One render process per
# sequence; h5 build after all renders land.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v4
export RSLO_PROXY_SEQSET=v4
mkdir -p $RSLO_PROXY_ROOT
for s in 0 1 2 3 7; do
  python -u scripts/accuracy_proxy.py build --seqs $s --profile urban \
    > /tmp/build_v4_seq$s.log 2>&1 &
done
wait
python -u scripts/accuracy_proxy.py build --h5_only --profile urban \
  > /tmp/build_v4_h5.log 2>&1 \
  && touch $RSLO_PROXY_ROOT/proxy.h5.done   # gate on h5 exit (ADVICE r4)
mkdir -p /root/repo/.proxy_store/v4
cp $RSLO_PROXY_ROOT/proxy.h5 /root/repo/.proxy_store/v4/ 2>/dev/null
cp $RSLO_PROXY_ROOT/gt_poses_*.npz /root/repo/.proxy_store/v4/ 2>/dev/null
echo BUILD_V4_DONE
