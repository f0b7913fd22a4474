"""Diagnose odometry predictions vs GT on the accuracy proxy.

Loads the latest checkpoint of a proxy model dir, runs N two-frame
windows from the val sequence, and prints per-window predicted vs GT
odometry plus aggregate direction/scale statistics — the fastest way
to tell "untrained noise" from "sign-inverted" from "scale collapse".

Usage: python scripts/diag_preds.py [middle] [n_windows]
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


def main(middle: str, n: int, supervised: bool = False, tag: str = ""):
    from rslo_tpu.data.dataset import KittiWindowDataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import (mean_vfe_ok, prepare_example,
                                       voxelizer_config)
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.train.checkpoint import CheckpointManager

    cfg = base_cfg(middle, 100)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, seq_length=2))
    vcfg = voxelizer_config(cfg)
    ds = KittiWindowDataset(cfg.data, "val", seq_length=2)
    mean_mode = mean_vfe_ok(cfg)
    mdir = _model_dir(middle, supervised, tag)
    net = OdomNet(cfg)

    # raw restore (no Trainer/init_state: that would jit-compile the
    # full train step just to build a template — ~20 min cold through
    # the remote compile service)
    raw = CheckpointManager.restore_raw_from(mdir)
    print("restored step:", int(np.asarray(raw.get("step", -1))))
    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", {})}

    @jax.jit
    def fwd(v, p, m):
        e = prepare_example(p, m, vcfg, mean_mode=mean_mode)
        return net.apply(v, e, train=False)["odometry"]

    preds, gts = [], []
    step = max(1, len(ds) // n)
    for i in range(0, step * n, step):
        s = ds[i]
        b = collate([s], cfg.data)
        o = np.asarray(fwd(variables, jnp.asarray(b["points"][0]),
                           jnp.asarray(b["point_mask"][0])))
        preds.append(o[0])            # first pair = frame0 -> frame1
        gts.append(np.asarray(b["odometry"][0][0]))
    P, G = np.stack(preds), np.stack(gts)
    print("pred t (first 6):\n", np.round(P[:6, :3], 3))
    print("gt   t (first 6):\n", np.round(G[:6, :3], 3))
    print("pred q (first 3):\n", np.round(P[:3, 3:], 4))
    print("gt   q (first 3):\n", np.round(G[:3, 3:], 4))
    tp, tg = P[:, :3], G[:, :3]
    dots = np.sum(tp * tg, 1) / (np.linalg.norm(tp, axis=1) *
                                 np.linalg.norm(tg, axis=1) + 1e-9)
    print(f"|t_pred| mean {np.linalg.norm(tp, axis=1).mean():.3f} "
          f"|t_gt| mean {np.linalg.norm(tg, axis=1).mean():.3f}")
    print(f"direction cos(t_pred, t_gt): mean {dots.mean():.3f} "
          f"min {dots.min():.3f}")
    err = np.linalg.norm(tp - tg, axis=1)
    err_neg = np.linalg.norm(-tp - tg, axis=1)
    print(f"mean |t_pred - t_gt| {err.mean():.3f}  "
          f"inverted {err_neg.mean():.3f}")
    # rotation: signed yaw per frame (the val loop turns at a constant
    # rate, so a yaw ratio << 1 means "predicts straight" — the round-3
    # rotation-collapse signature)
    def yaw(q):
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return np.degrees(np.arctan2(2 * (w * z + x * y),
                                     1 - 2 * (y * y + z * z)))
    yp, yg = yaw(P[:, 3:] * np.sign(P[:, 3:4])), yaw(G[:, 3:])
    print(f"yaw/frame deg: pred mean {yp.mean():+.3f} std {yp.std():.3f}"
          f" | gt mean {yg.mean():+.3f} std {yg.std():.3f}"
          f" | corr {np.corrcoef(yp, yg)[0, 1]:.3f}"
          f" | ratio {yp.mean() / (yg.mean() + 1e-9):+.3f}")


if __name__ == "__main__":
    middle = sys.argv[1] if len(sys.argv) > 1 else "PillarMiddleCov"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    sup = "--supervised" in sys.argv
    tag = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--tag=")), "")
    main(middle, n, sup, tag)
