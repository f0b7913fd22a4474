#!/bin/bash
# Round-4 queue C — rotation-learnability isolation matrix on world v3.
# The v3 WITH-augs supervised control still failed rotation (r_rel 172
# at s3000), so the blocker is one of the two things added since r2's
# successful v1 control (r_rel 24.2): the aug stack, or the int16
# transfer quantization / 65k cap.  Two 3000-step supervised controls:
#   A. v3 + NO augs (quantization ON)     -> tag v3na
#   B. v3 + NO augs + NO quantization     -> tag v3naf32
# Then diags for both.  ~40 min each.
set -x
cd /root/repo
export RSLO_PROXY_ROOT=/tmp/rslo_proxy_v3
rm -f /tmp/queue_stop

step() {
  if [ -e /tmp/queue_stop ]; then
    echo "$(date +%H:%M:%S) queue_stop — exiting" >> /tmp/tpu_r4c.log
    exit 0
  fi
  local t="$1" log="$2"; shift 2
  echo "$(date +%H:%M:%S) START $log" >> /tmp/tpu_r4c.log
  timeout "$t" "$@" > "$log" 2>&1 \
    || echo "$(date +%H:%M:%S) FAILED($?) $log" >> /tmp/tpu_r4c.log
  echo "$(date +%H:%M:%S) END $log" >> /tmp/tpu_r4c.log
  sleep 15
}

# --- A: v3 no-aug (quantized) ------------------------------------------
for S in 1500 3000; do
  step 3600 /tmp/r4_v3na_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
    --tag v3na --no_aug --leg_until $S --steps_per_eval 750
done
step 2400 /tmp/r4_v3na_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=v3na

# --- B: v3 no-aug, f32 transfer ----------------------------------------
for S in 1500 3000; do
  step 3600 /tmp/r4_v3naf32_leg$S.log python -u scripts/accuracy_proxy.py \
    train --middle PillarMiddleCov --steps 3000 --supervised --remat 0 \
    --tag v3naf32 --no_aug --no_quantize --leg_until $S \
    --steps_per_eval 750
done
step 2400 /tmp/r4_v3naf32_diag.log python -u scripts/diag_preds.py \
  PillarMiddleCov 24 --supervised --tag=v3naf32

echo "$(date +%H:%M:%S) R4C QUEUE DONE" >> /tmp/tpu_r4c.log
