#!/bin/bash
# Round-2 TPU queue, stage 5: covariance-weighted BA refinement eval on
# the self-sup pillar model (scale drift correction showcase).
set -x
cd /root/repo
while ! grep -q "TPU QUEUE 4 DONE" /tmp/tpu_queue_r2d.log 2>/dev/null; do
  sleep 60
done
sleep 90
timeout 7200 python -u - > /tmp/proxy_eval_pillar_ba.log 2>&1 <<'PYEOF'
import sys
sys.argv = ["accuracy_proxy.py", "eval", "--middle", "PillarMiddleCov"]
sys.path.insert(0, "scripts")
import accuracy_proxy as ap
import json
from pathlib import Path
from rslo_tpu.cli import main
cfg = ap.base_cfg("PillarMiddleCov", 100)
p = ap.ROOT / "eval_PillarMiddleCov.json"
p.write_text(cfg.to_json())
mdir = ap._model_dir("PillarMiddleCov", False)
main(["evaluate", "--config", str(p), "--model_dir", mdir, "--refine_ba"])
res = json.loads((Path(mdir) / "eval_results.json").read_text())
(ap.ROOT / "result_PillarMiddleCov_ba.json").write_text(
    json.dumps(res, indent=1))
print("saved result_PillarMiddleCov_ba.json", flush=True)
PYEOF
echo "TPU QUEUE 5 DONE"
