"""Checkpoint-free probe: can the consistency ICP recover a known pose
residual on realistic proxy clouds?

Round-3 finding: self-supervised training leaves val rotation at
~1.0 deg/frame error (= the val loop's yaw rate: the model predicts
nearly straight) while translation converges.  The pseudo-target
mechanism (losses/objective.py) can only pull rotation if the inner
weighted-Kabsch ICP (losses/consistency.py) actually recovers a ~1 deg
yaw residual from the two warped clouds.  This probe measures that
closure rate DIRECTLY, no checkpoint needed:

  1. render two frames of the synth world with a known relative motion
     (translation 0.8 m + yaw 0.9 deg: the val loop's per-frame motion);
  2. voxel-subsample both clouds at proxy settings;
  3. inject a known residual error into the "predicted" motion, warp
     the target cloud by the prediction (exactly like objective.py);
  4. run consistency ICP and compare the pseudo target against GT.

Prints closure tables across residual magnitude / axis, icp_iter, and
Kabsch weighting variants.  closure = 1 - err(pseudo)/err(pred): 1.0
is full recovery, 0 means the pseudo target is no better than the
prediction, <0 means ICP pushes the WRONG way.

Reference mechanism: /root/reference/rslo/models/voxel_odom_net.py:
586-735 (create_loss ICP pseudo targets).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

import numpy as np

os.environ.setdefault("RSLO_CPU", "1")
import rslo_tpu.utils.jax_cache  # noqa: F401
import jax

if os.environ.get("RSLO_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from rslo_tpu.geometry.transforms import (  # noqa: E402
    np_calc_vo, quat_to_matrix_np, tq_to_RT)
from rslo_tpu.losses.consistency import consistency_pair  # noqa: E402
from rslo_tpu.utils.world import SynthWorld  # noqa: E402


def yaw_quat(deg):
    a = np.deg2rad(deg) / 2
    return np.array([np.cos(a), 0, 0, np.sin(a)])


def subsample_voxel(pts, cell=0.3, cap=8192, rng=None):
    """Voxel-grid subsample (keep one point per cell) — stand-in for the
    voxelizer's centroid clouds at matching density."""
    ids = np.floor(pts[:, :3] / cell).astype(np.int64)
    _, first = np.unique(ids, axis=0, return_index=True)
    sel = np.sort(first)
    if len(sel) > cap:
        sel = rng.choice(sel, cap, replace=False)
    out = np.zeros((cap, pts.shape[1]), np.float32)
    m = np.zeros((cap,), bool)
    out[:len(sel)] = pts[sel]
    m[:len(sel)] = True
    return out, m


def rot_angle_deg(R):
    c = (np.trace(R) - 1) / 2
    return np.rad2deg(np.arccos(np.clip(c, -1, 1)))


def main():
    rng = np.random.default_rng(0)
    world = SynthWorld(seed=0)
    # frame A at a generic spot; frame B = A + (0.8 m forward, yaw deg)
    yaw0 = np.deg2rad(30.0)
    qA = np.array([np.cos(yaw0 / 2), 0, 0, np.sin(yaw0 / 2)])
    pA = np.array([5.0, -3.0, 0.0, *qA], np.float32)

    gt_yaw_deg = 0.9
    gt_t_fwd = 0.8
    q_rel = yaw_quat(gt_yaw_deg)
    # pose B = pose A composed with relative motion (in A's frame)
    RA = quat_to_matrix_np(qA)
    tB = pA[:3] + RA @ np.array([gt_t_fwd, 0.0, 0.0])
    from rslo_tpu.geometry.transforms import _np_qmult
    qB = _np_qmult(qA[None], q_rel[None])[0]
    pB = np.array([*tB, *qB], np.float32)

    fA = world.scan(pA, rng, n_beams=64, n_azimuth=1024)
    fB = world.scan(pB, rng, n_beams=64, n_azimuth=1024)

    # GT motion mapping B-frame points into A-frame coords:
    # vo = inv(pose_A) o pose_B  (np_calc_vo convention check below)
    vo = np_calc_vo(pA[None], pB[None])[0]
    RT = tq_to_RT(vo)                   # (3, 4)
    R_gt, t_gt = RT[:, :3], RT[:, 3]

    srcp, srcm = subsample_voxel(fA, rng=rng)
    tgtp, tgtm = subsample_voxel(fB, rng=rng)

    # sanity: GT warp aligns clouds (mean NN dist should be small)
    warped = tgtp[:, :3] @ R_gt.T + t_gt
    from scipy.spatial import cKDTree
    d0, _ = cKDTree(warped[tgtm]).query(srcp[srcm][:2000, :3])
    print(f"sanity: GT-warp NN mean dist = {d0.mean():.3f} m "
          f"(cloud cell 0.3 m)", flush=True)

    src_j = jnp.asarray(srcp[:, :3])
    srcn_j = jnp.asarray(srcp[:, 4:7])
    srcm_j = jnp.asarray(srcm)
    tgt_j = jnp.asarray(tgtp[:, :3])
    tgtm_j = jnp.asarray(tgtm)
    zero_cov = jnp.zeros((srcp.shape[0], 7), jnp.float32)
    zero_cov_sp = jnp.zeros((tgtp.shape[0], 3, 3), jnp.float32)

    def run_icp(R_pred, t_pred, icp_iter, penalize_ratio=0.97):
        tgt_w = tgt_j @ jnp.asarray(R_pred).T + jnp.asarray(t_pred)
        out = consistency_pair(
            src_j, srcm_j, srcn_j, zero_cov,
            tgt_w, tgtm_j, zero_cov_sp, jnp.asarray(R_pred),
            penalize_ratio=penalize_ratio, reg_weight=0.005,
            icp_iter=icp_iter, no_cov=True)
        res_R = np.asarray(out.res_R)
        res_t = np.asarray(out.res_t)
        R_tgt = res_R @ R_pred
        t_tgt = res_R @ t_pred + res_t
        return R_tgt, t_tgt

    def report(label, R_pred, t_pred, icp_iter):
        R_tgt, t_tgt = run_icp(R_pred, t_pred, icp_iter)
        e_rot_pred = rot_angle_deg(R_pred.T @ R_gt)
        e_rot_tgt = rot_angle_deg(R_tgt.T @ R_gt)
        e_t_pred = np.linalg.norm(t_pred - t_gt)
        e_t_tgt = np.linalg.norm(t_tgt - t_gt)
        cr = 1 - e_rot_tgt / max(e_rot_pred, 1e-9)
        ct = 1 - e_t_tgt / max(e_t_pred, 1e-9)
        print(f"{label:38s} rot {e_rot_pred:6.3f}->{e_rot_tgt:6.3f} deg "
              f"(closure {cr:+.2f})   t {e_t_pred:5.3f}->{e_t_tgt:5.3f} m "
              f"(closure {ct:+.2f})", flush=True)

    print("\n== residual sweep (icp_iter=6, deployed weighting) ==")
    for yaw_err in (0.3, 0.9, 2.0):
        Rp = R_gt @ quat_to_matrix_np(yaw_quat(-yaw_err))
        report(f"yaw residual {yaw_err:.1f} deg", Rp, t_gt.copy(), 6)
    for t_err in (0.2, 0.5):
        report(f"t residual {t_err:.1f} m (fwd)",
               R_gt.copy(), t_gt - RA.T @ np.zeros(3) -
               np.array([t_err, 0, 0]), 6)
    # combined: the realistic early-training state
    Rp = R_gt @ quat_to_matrix_np(yaw_quat(-0.9))
    report("yaw 0.9 deg + t 0.3 m", Rp,
           t_gt - np.array([0.3, 0, 0]), 6)

    print("\n== icp_iter sweep (yaw residual 0.9 deg) ==")
    Rp = R_gt @ quat_to_matrix_np(yaw_quat(-0.9))
    for it in (1, 2, 6, 12):
        report(f"icp_iter={it}", Rp, t_gt.copy(), it)

    print("\n== identity prediction (warmup regime) ==")
    report("R=I, t=0 (full motion residual)",
           np.eye(3), np.zeros(3), 6)


if __name__ == "__main__":
    main()
