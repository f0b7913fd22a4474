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
cp $MDIR/best_ckpt.json results/ 2>/dev/null
cp $MDIR/eval_results.json results/eval_results_r5b.json 2>/dev/null
mkdir -p results/plots && cp $MDIR/plots/*.png results/plots/ 2>/dev/null
cp $MDIR/log.json.lst results/train_log_r5b.json.lst 2>/dev/null
cp -r $MDIR .proxy_store/v4/ 2>/dev/null
echo R5_FINISH_DONE
