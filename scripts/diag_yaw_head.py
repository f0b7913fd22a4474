"""Localize the rotation failure inside the head: does the dense tq map
encode yaw at all, or does the confidence vote cancel it?

Runs the trained model on TRAIN windows (varied yaw, unlike the
constant-yaw val loop), and reports per window:
  * gt yaw,
  * the aggregated vote's yaw (the odometry output),
  * the CELL-LEVEL yaw field statistics (conf-weighted mean, spatial
    std) from the raw tq map.

If map-level yaw correlates with gt but the vote does not, the voting /
confidence stage is the bug; if the map itself is yaw-dead (spatially
uniform near zero, uncorrelated), the failure is upstream (features or
optimization).

Usage: RSLO_CPU=1 python scripts/diag_yaw_head.py [tag] [n] [--supervised]
"""
import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax

if os.environ.get("RSLO_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from accuracy_proxy import base_cfg, _model_dir  # noqa: E402


def yaw_of(q):
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.degrees(np.arctan2(2 * (w * z + x * y),
                                 1 - 2 * (y * y + z * z)))


def main(tag: str, n: int, supervised: bool):
    from rslo_tpu.data.dataset import KittiWindowDataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import (mean_vfe_ok, prepare_example,
                                       voxelizer_config)
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.train.checkpoint import CheckpointManager

    cfg = base_cfg("PillarMiddleCov", 100)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, seq_length=2, skip=1, random_skip=False,
        pose_interp_ratio=0.0, random_flip_y=False))
    vcfg = voxelizer_config(cfg)
    split = "val" if "--val" in sys.argv else "train"
    ds = KittiWindowDataset(cfg.data, split, seq_length=2)
    mean_mode = mean_vfe_ok(cfg)
    mdir = _model_dir("PillarMiddleCov", supervised, tag)
    net = OdomNet(cfg)
    raw = CheckpointManager.restore_raw_from(mdir)
    print("restored step:", int(np.asarray(raw.get("step", -1))),
          "from", mdir, flush=True)
    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", {})}

    @jax.jit
    def fwd(v, p, m):
        e = prepare_example(p, m, vcfg, mean_mode=mean_mode)
        out = net.apply(v, e, train=False)
        return (out["odometry"], out["tq_map"], out["q_conf"],
                out["input_mask"])

    print(f"{'gt yaw':>8s} {'vote yaw':>9s} {'map yaw(cw)':>11s} "
          f"{'map yaw std':>11s} {'conf cv':>8s}")
    rows = []
    step = max(1, len(ds) // n)
    for i in range(0, step * n, step):
        s = ds[i]
        b = collate([s], cfg.data)
        odom, tq, qc, im = fwd(variables, jnp.asarray(b["points"][0]),
                               jnp.asarray(b["point_mask"][0]))
        odom = np.asarray(odom)[0]
        tq = np.asarray(tq, np.float32)[0]          # (H, W, 7)
        qc = np.asarray(qc, np.float32)[0][..., 0]  # (H, W)
        m = np.asarray(im, np.float32)[0][..., 0] > 0
        gt_yaw = yaw_of(np.asarray(b["odometry"][0][0][3:])[None])[0]
        vote_yaw = yaw_of(odom[3:][None] * np.sign(odom[3]))[0]
        cell_yaw = yaw_of(tq[..., 3:])
        w = qc * m
        wsum = w.sum() + 1e-12
        map_yaw = float((cell_yaw * w).sum() / wsum)
        map_std = float(np.sqrt(((cell_yaw - map_yaw) ** 2 * w).sum()
                                / wsum))
        conf_cv = float(qc[m].std() / (qc[m].mean() + 1e-12))
        rows.append((gt_yaw, vote_yaw, map_yaw, map_std, conf_cv))
        print(f"{gt_yaw:8.3f} {vote_yaw:9.3f} {map_yaw:11.3f} "
              f"{map_std:11.3f} {conf_cv:8.3f}", flush=True)
    R = np.array(rows)
    def corr(a, b):
        return np.corrcoef(a, b)[0, 1]
    print(f"\ncorr(gt, vote) {corr(R[:,0], R[:,1]):+.3f}   "
          f"corr(gt, map)  {corr(R[:,0], R[:,2]):+.3f}")
    print(f"slope vote/gt {np.polyfit(R[:,0], R[:,1], 1)[0]:+.3f}   "
          f"slope map/gt {np.polyfit(R[:,0], R[:,2], 1)[0]:+.3f}")


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "v3naf32"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(tag, n, "--supervised" in sys.argv)
