"""Per-pair-type magnitude probe (translation scale diagnosis).

Loads a trained proxy model, runs TRAIN windows (L=3 -> pairs (0,1),
(0,2), (1,2)), and prints predicted vs GT |t| per pair type.  A
magnitude-blind net predicts ~the same |t| for 1-step and 2-step
pairs; a healthy one predicts ~2x for (0,2).

Usage: RSLO_CPU=1 python scripts/diag_pairtypes.py [middle] [n] [--supervised]
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("RSLO_CPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent))
from accuracy_proxy import base_cfg, _model_dir  # noqa: E402


def main(middle: str, n: int, supervised: bool, tag: str = ""):
    from rslo_tpu.data.dataset import KittiWindowDataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.train.checkpoint import CheckpointManager

    cfg = base_cfg(middle, 100)
    vcfg = voxelizer_config(cfg)
    ds = KittiWindowDataset(cfg.data, "train", seq_length=3)
    net = OdomNet(cfg)

    # raw restore — Trainer.init_state would jit the full train step
    # (~20 min cold through the remote compile service) just for a
    # restore template
    raw = CheckpointManager.restore_raw_from(
        _model_dir(middle, supervised, tag))
    print("restored step:", int(np.asarray(raw.get("step", -1))),
          flush=True)
    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", {})}

    @jax.jit
    def fwd(pts, msk):
        ex = prepare_example(pts, msk, vcfg)
        return net.apply(variables, ex, train=False)["odometry"]

    names = ["(0,1)", "(0,2)", "(1,2)"]
    P = {k: [] for k in names}
    G = {k: [] for k in names}
    stride = max(1, len(ds) // n)
    for w in range(0, stride * n, stride):
        b = collate([ds[w]], cfg.data)
        od = np.asarray(fwd(jnp.asarray(b["points"][0]),
                            jnp.asarray(b["point_mask"][0])))
        gt = np.asarray(b["odometry"][0]).reshape(-1, 7)
        for k in range(3):
            P[names[k]].append(od[k, :3])
            G[names[k]].append(gt[k, :3])
    for k in names:
        p = np.linalg.norm(np.stack(P[k]), axis=1)
        g = np.linalg.norm(np.stack(G[k]), axis=1)
        print(f"pair {k}: |t_pred| {p.mean():.3f}+-{p.std():.3f}  "
              f"|t_gt| {g.mean():.3f}  ratio {p.mean()/g.mean():.3f}",
              flush=True)


if __name__ == "__main__":
    tag = ""
    for a in sys.argv:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    main(sys.argv[1] if len(sys.argv) > 1 else "PillarMiddleCov",
         int(sys.argv[2]) if len(sys.argv) > 2 else 6,
         "--supervised" in sys.argv, tag)
