#!/bin/bash
# Round-5 results packaging: run AFTER tpu_r5b.sh completes.  Copies
# eval JSON + report + trajectory plots + best-ckpt metadata into the
# tracked results/ dir and refreshes the .proxy_store stash.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=${RSLO_PROXY_ROOT:-/tmp/rslo_proxy_v4}
export RSLO_PROXY_SEQSET=v4
MDIR=$RSLO_PROXY_ROOT/model_PillarMiddleCov_r5b
mkdir -p results .proxy_store/v4

python scripts/accuracy_proxy.py report | tee results/proxy_report_r5b.txt
cp $RSLO_PROXY_ROOT/result_*.json results/ 2>/dev/null
mkdir -p results/plots
for tag in r5b r5c; do
  M=$RSLO_PROXY_ROOT/model_PillarMiddleCov_$tag
  [ -d "$M" ] || continue
  cp $M/best_ckpt.json results/best_ckpt_$tag.json 2>/dev/null
  cp $M/eval_results.json results/eval_results_$tag.json 2>/dev/null
  for p in $M/plots/*.png; do
    [ -f "$p" ] && cp "$p" results/plots/${tag}_$(basename $p)
  done
  cp $M/log.json.lst results/train_log_$tag.json.lst 2>/dev/null
  cp -r $M .proxy_store/v4/ 2>/dev/null
done
echo R5_FINISH_DONE
