"""Loop-closure layer: polar descriptor matching, ICP edge measurement,
and the full close_loops drift-correction pass (structured synthetic
world, CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rslo_tpu.geometry import (np_compose_pose, np_invert_pose,
                               quat_to_matrix_np)
from rslo_tpu.pgo.loop_closure import (close_loops, detect_loops,
                                       icp_align, polar_descriptor,
                                       shift_similarity, shift_to_yaw,
                                       yaw_pose)
from rslo_tpu.utils.synthetic import synth_cloud


def make_world(seed=3, n=40000, extent=40.0):
    rng = np.random.default_rng(seed)
    return synth_cloud(rng, n_points=n, extent=extent)


def local_cloud(world, pose, n_keep=3000, radius=28.0):
    """Crop the world around a sensor pose and express it locally."""
    t, q = pose[:3], pose[3:]
    rel = world[:, :3] - t
    loc = rel @ quat_to_matrix_np(q)          # R^T rows
    d = np.linalg.norm(loc[:, :2], axis=1)
    idx = np.argsort(d)[:n_keep]
    return loc[idx].astype(np.float32)


def yaw_pose_np(yaw, t=(0.0, 0.0, 0.0)):
    return np.array([t[0], t[1], t[2], np.cos(yaw / 2), 0, 0,
                     np.sin(yaw / 2)], np.float32)


def test_descriptor_detects_revisit_with_yaw():
    world = make_world()
    p_j = yaw_pose_np(0.0)
    psi = 2 * np.pi * 9 / 60
    p_i = yaw_pose_np(psi, t=(0.6, -0.4, 0.0))
    cj = local_cloud(world, p_j)
    ci = local_cloud(world, p_i)
    mask = jnp.ones(len(cj), bool)
    dj = polar_descriptor(jnp.asarray(cj), mask, max_radius=25.0)
    di = polar_descriptor(jnp.asarray(ci), mask, max_radius=25.0)
    # far-away place: low similarity
    p_far = yaw_pose_np(0.0, t=(30.0, 20.0, 0.0))
    dfar = polar_descriptor(
        jnp.asarray(local_cloud(world, p_far)), mask, max_radius=25.0)
    sc, sh = shift_similarity(di, jnp.stack([dj, dfar]))
    sc = np.asarray(sc)
    assert sc[0] > 0.9 and sc[0] > sc[1] + 0.15, sc
    # recovered yaw == yaw of T_{i<-j} = -psi (frames rotate, points
    # counter-rotate)
    yaw = float(shift_to_yaw(sh, 60)[0])
    assert abs(yaw - (-psi)) < 2 * np.pi / 60 + 1e-6, (yaw, -psi)


def test_icp_align_recovers_relative_pose():
    world = make_world()
    psi = 0.5
    p_j = yaw_pose_np(0.0)
    p_i = yaw_pose_np(psi, t=(0.8, -0.5, 0.1))
    cj = local_cloud(world, p_j)
    ci = local_cloud(world, p_i)
    mask = jnp.ones(len(cj), bool)
    # analytic T_{i<-j} = P_i^-1 * P_j
    expect = np_compose_pose(np_invert_pose(p_i[None]), p_j[None])[0]
    init = yaw_pose(jnp.asarray(-psi))    # descriptor-style yaw seed
    pose, res, frac = icp_align(jnp.asarray(ci), mask, jnp.asarray(cj),
                                mask, init, iters=10, gate=2.0)
    pose = np.asarray(pose)
    assert float(frac) > 0.5
    np.testing.assert_allclose(pose[:3], expect[:3], atol=0.15)
    # quaternion up to sign
    qd = min(np.linalg.norm(pose[3:] - expect[3:]),
             np.linalg.norm(pose[3:] + expect[3:]))
    assert qd < 0.02, (pose, expect)


def _loop_trajectory(n_frames=25, radius=15.0):
    """Closed circular trajectory; the last frame re-visits the first."""
    poses = []
    for k in range(n_frames):
        ang = 2 * np.pi * k / (n_frames - 1)
        t = np.array([radius * np.cos(ang) - radius,
                      radius * np.sin(ang), 0.0])
        yaw = ang + np.pi / 2   # heading along the circle
        poses.append(yaw_pose_np(yaw, t))
    return np.stack(poses)


def test_close_loops_corrects_drift():
    world = make_world(n=60000, extent=45.0)
    gt = _loop_trajectory()
    n = len(gt)
    clouds = [local_cloud(world, p) for p in gt]
    # true odometry + a yaw drift bias
    odoms = np_compose_pose(np_invert_pose(gt[:-1]), gt[1:])
    drift = yaw_pose_np(0.006)
    odoms_noisy = np_compose_pose(odoms, np.tile(drift, (n - 1, 1)))

    poses, cands = close_loops(odoms_noisy, clouds,
                               min_separation=15,
                               score_threshold=0.85, loop_info=50.0)
    assert len(cands.pairs) >= 1, "no loop detected"
    # drifted chain endpoint error vs corrected endpoint error
    from rslo_tpu.geometry import odom_to_abs_pose
    ident = np.array([[0, 0, 0, 1, 0, 0, 0]], np.float32)
    chain = odom_to_abs_pose(
        np.concatenate([ident, odoms_noisy]).astype(np.float32))
    e_chain = np.linalg.norm(chain[-1, :3] - gt[-1, :3])
    e_opt = np.linalg.norm(poses[-1, :3] - gt[-1, :3])
    assert e_chain > 0.5, e_chain          # drift is meaningful
    assert e_opt < 0.5 * e_chain, (e_opt, e_chain)


def test_detect_loops_empty_on_short_trajectory():
    d = jnp.zeros((10, 20, 60))
    out = detect_loops(d, min_separation=50)
    assert out.pairs.shape == (0, 2)
