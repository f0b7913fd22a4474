"""Measure self-supervised pseudo-target quality on the proxy.

Runs the train-mode forward on training windows with the self-sup
checkpoint, reproduces the objective's ICP pseudo-target composition
(losses/objective.py), and prints pred / pseudo-target / GT motion
triples — the direct test of "is the ICP correction pulling the
predictions toward the true motion?".

Usage: python scripts/diag_pseudo.py [middle] [n_windows] [--warmup]
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax

if os.environ.get("RSLO_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from accuracy_proxy import base_cfg, _model_dir  # noqa: E402


def main(middle: str, n: int, warmup: bool):
    from jax.sharding import Mesh
    from rslo_tpu.data.dataset import KittiWindowDataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    from rslo_tpu.geometry import (hemisphere, matrix_to_quat,
                                   quat_to_matrix)
    from rslo_tpu.losses.consistency import consistency_loss_pairs
    from rslo_tpu.train.loop import Trainer

    cfg = base_cfg(middle, 100)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, seq_length=2,
                                               random_flip_y=False))
    lcfg = cfg.loss
    vcfg = voxelizer_config(cfg)
    ds = KittiWindowDataset(cfg.data, "train", seq_length=2)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    trainer = Trainer(cfg, _model_dir(middle, False), mesh)
    net = trainer.net

    b0 = collate([ds[0]], cfg.data)
    ex0 = jax.jit(lambda p, m: prepare_example(p, m, vcfg))(
        jnp.asarray(b0["points"][0]), jnp.asarray(b0["point_mask"][0]))
    ex0["odometry"] = jnp.asarray(b0["odometry"][0])
    state = trainer.init_state(ex0)
    print("restored step:", int(state.step), flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def run(v, p, m):
        e = prepare_example(p, m, vcfg)
        preds = net.apply(v, e, train=True,
                          mutable=["batch_stats"])[0]
        odom = preds["odometry"].astype(jnp.float32)
        T_pred, q_pred = odom[:, :3], odom[:, 3:]
        feats = preds["voxel_features"]
        covs = preds["voxel_covs"]
        masks = preds["voxel_masks"]
        V = feats[0].shape[0]
        stride = max(1, -(-V // lcfg.max_loss_points))

        def sub(x):
            return x[::stride][:lcfg.max_loss_points]

        def pts_of(t):
            f = sub(feats[t])
            return jnp.concatenate([f[:, 0:3], f[:, 4:7]], axis=-1)

        src_pts = pts_of(0)[None]
        tgt_pts = pts_of(1)[None]
        src_mask = sub(masks[0])[None]
        tgt_mask = sub(masks[1])[None]
        src_cov = sub(covs[0])[None]
        tgt_cov = sub(covs[1])[None]
        if warmup:
            R_use = jnp.eye(3, dtype=jnp.float32)[None]
            T_use = jnp.zeros((1, 3), jnp.float32)
        else:
            R_use = quat_to_matrix(q_pred[:1])
            T_use = T_pred[:1]
        tgt_xyz = jnp.einsum('pij,pnj->pni', R_use,
                             tgt_pts[..., :3]) + T_use[:, None, :]
        c_raw, rR, rt = consistency_loss_pairs(
            src_pts[..., :3], src_mask, src_pts[..., 3:6], src_cov,
            tgt_xyz, tgt_mask, tgt_cov, R_use, T_use,
            penalize_ratio=lcfg.penalize_ratio,
            reg_weight=lcfg.reg_weight,
            icp_iter=lcfg.warmup_icp_iter if warmup else lcfg.icp_iter)
        R_tgt = rR @ R_use
        t_tgt = jnp.einsum('pij,pj->pi', rR, T_use) + rt
        q_tgt = hemisphere(matrix_to_quat(R_tgt))
        return odom[0], t_tgt[0], q_tgt[0], c_raw

    step = max(1, (len(ds) - 1) // n)
    rows = []
    for i in range(0, step * n, step):
        b = collate([ds[i]], cfg.data)
        o, tt, qt, c = run(variables, jnp.asarray(b["points"][0]),
                           jnp.asarray(b["point_mask"][0]))
        gt = np.asarray(b["odometry"][0][0])
        rows.append((np.asarray(o), np.asarray(tt), np.asarray(qt),
                     gt, float(c)))
    print(f"{'pred t':>24s} | {'pseudo t':>24s} | {'gt t':>24s} | C")
    for o, tt, qt, gt, c in rows[:10]:
        f = lambda v: np.array2string(np.asarray(v)[:3],
                                      precision=3, suppress_small=True)
        print(f"{f(o):>24s} | {f(tt):>24s} | {f(gt):>24s} | {c:.4f}")
    P = np.stack([r[0][:3] for r in rows])
    T = np.stack([r[1] for r in rows])
    G = np.stack([r[3][:3] for r in rows])
    Qp = np.stack([r[0][3:] for r in rows])
    Qt = np.stack([r[2] for r in rows])
    Qg = np.stack([r[3][3:] for r in rows])
    print("mean |pseudo - gt| t:", np.linalg.norm(T - G, axis=1).mean())
    print("mean |pred   - gt| t:", np.linalg.norm(P - G, axis=1).mean())
    print("mean |pseudo - pred| t:",
          np.linalg.norm(T - P, axis=1).mean())
    print("qz pred/pseudo/gt means:",
          Qp[:, 3].mean(), Qt[:, 3].mean(), Qg[:, 3].mean())


if __name__ == "__main__":
    middle = sys.argv[1] if len(sys.argv) > 1 else "PillarMiddleCov"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(middle, n, "--warmup" in sys.argv)
