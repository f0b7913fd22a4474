"""BA bridge: noisy window odometry + shared structure -> refined poses."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu import geometry as G
from rslo_tpu.pgo.ba_bridge import (cov_trace_weights, refine_window_ba,
                                    window_ba_problem)


def make_window(rng, L=4, N=800, noise=0.0):
    """A static structured scene observed from L poses."""
    world = np.concatenate([
        rng.uniform(-20, 20, size=(N // 2, 3)) * [1, 1, 0.05],
        rng.uniform(-20, 20, size=(N // 2, 3)) * [1, 0.05, 1] + [0, 8, 2],
    ]).astype(np.float32)
    gt_poses = np.zeros((L, 7), np.float32)
    gt_poses[:, 3] = 1.0
    for i in range(1, L):
        step = np.array([1.0, 0.05, 0.0, np.cos(0.005), 0, 0,
                         np.sin(0.005)], np.float32)
        gt_poses[i] = G.np_compose_pose(gt_poses[i - 1][None],
                                        step[None])[0]
    frames = []
    for i in range(L):
        inv = G.np_invert_pose(gt_poses[i])
        local = np.asarray(G.transform_points(jnp.asarray(inv),
                                              jnp.asarray(world)))
        local = local + rng.normal(0, 0.005, local.shape)
        frames.append(local.astype(np.float32))
    gt_odoms = np.stack([
        G.np_calc_vo(gt_poses[i][None], gt_poses[i + 1][None])[0]
        for i in range(L - 1)])
    noisy = gt_odoms.copy()
    if noise:
        noisy[:, :3] += rng.normal(0, noise, noisy[:, :3].shape)
    return frames, gt_poses, noisy.astype(np.float32)


def test_window_ba_problem_builds(rng):
    frames, gt_poses, odoms = make_window(rng)
    prob = window_ba_problem(frames, gt_poses)
    assert prob is not None
    assert prob.landmarks.shape[1] == 3
    assert int(prob.obs_pose.shape[0]) > len(frames[0])


def test_refine_window_ba_reduces_error(rng):
    frames, gt_poses, noisy = make_window(rng, noise=0.05)
    refined = refine_window_ba(frames, noisy, iters=6,
                               assoc_threshold=0.8)
    odoms0 = np.zeros((len(frames), 7), np.float32)
    odoms0[:, 3] = 1.0
    odoms0[1:] = noisy
    chained = G.odom_to_abs_pose(odoms0)
    err0 = np.linalg.norm(chained[:, :3] - gt_poses[:, :3], axis=1).mean()
    err1 = np.linalg.norm(refined[:, :3] - gt_poses[:, :3], axis=1).mean()
    assert err1 < err0 * 0.5, (err0, err1)


def test_refine_falls_back_when_sparse(rng):
    frames, gt_poses, noisy = make_window(rng, L=3, N=40, noise=0.05)
    # impossible gate -> too few associations -> fall back to chaining
    refined = refine_window_ba(frames, noisy, assoc_threshold=1e-6)
    odoms0 = np.zeros((3, 7), np.float32)
    odoms0[:, 3] = 1.0
    odoms0[1:] = noisy
    np.testing.assert_allclose(refined, G.odom_to_abs_pose(odoms0),
                               atol=1e-6)


def test_cov_trace_weights():
    params = np.zeros((4, 7), np.float32)
    params[:, 0] = [0.0, 0.1, 1.0, 5.0]
    w = cov_trace_weights(params)
    assert np.all(np.diff(w) < 0)  # bigger covariance -> smaller weight
    assert w[0] == 1.0
