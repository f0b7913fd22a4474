"""Pose-graph optimization tests (port of the reference's inline
test_pgo, /root/reference/rslo/utils/pose_utils.py:1237-1349): noisy
chain + loop closures converges back to ground truth."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu import geometry as G
from rslo_tpu.pgo.pose_graph import (PoseGraph, chain_graph, edge_residual,
                                     optimize_pose_graph)


def circle_odoms(n=20, radius=10.0):
    """Ground-truth odometry around a circle (constant arc + yaw)."""
    ang = 2 * np.pi / n
    step = 2 * radius * np.sin(ang / 2)
    odoms = np.zeros((n - 1, 7), np.float32)
    odoms[:, 0] = step
    odoms[:, 3] = np.cos(ang / 2)
    odoms[:, 6] = np.sin(ang / 2)
    return odoms


def test_edge_residual_zero_for_consistent():
    p0 = jnp.asarray([[0, 0, 0, 1, 0, 0, 0]], jnp.float32)
    z = jnp.asarray([[1, 0, 0, np.cos(0.1), 0, 0, np.sin(0.1)]],
                    jnp.float32)
    z = jnp.concatenate([z[:, :3], G.qnormalize(z[:, 3:])], -1)
    p1 = G.compose_pose(p0, z)
    r = edge_residual(p0, p1, z)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def test_chain_noise_reduction(rng):
    odoms_gt = circle_odoms(16)
    gt_abs = G.odom_to_abs_pose(
        np.concatenate([[[0, 0, 0, 1, 0, 0, 0]], odoms_gt]))
    # noisy odometry
    noisy = odoms_gt.copy()
    noisy[:, :3] += rng.normal(0, 0.05, noisy[:, :3].shape)
    q_noise = np.stack([G.qexp(jnp.asarray(rng.normal(0, 0.01, 3)))
                        for _ in range(len(noisy))])
    noisy[:, 3:] = np.asarray(G.qmult(jnp.asarray(noisy[:, 3:]),
                                      jnp.asarray(q_noise)))

    # loop closure: edge from last pose back to first with the TRUE
    # relative motion
    n = len(odoms_gt) + 1
    loop_e = jnp.asarray([[n - 1, 0]], jnp.int32)
    rel = G.np_calc_vo(gt_abs[n - 1:n], gt_abs[0:1])
    loop_m = jnp.asarray(rel, jnp.float32)
    loop_i = jnp.eye(6)[None] * 100.0

    poses0, graph = chain_graph(jnp.asarray(noisy), info_scale=1.0,
                                loop_edges=loop_e, loop_meas=loop_m,
                                loop_info=loop_i)
    opt, cost = optimize_pose_graph(poses0, graph, iters=20)
    opt = np.asarray(opt)

    # end-of-chain drift must shrink substantially after optimization
    err_before = np.linalg.norm(np.asarray(poses0)[n - 1, :3] -
                                gt_abs[n - 1, :3])
    err_after = np.linalg.norm(opt[n - 1, :3] - gt_abs[n - 1, :3])
    assert err_after < err_before * 0.7, (err_before, err_after)
    assert np.isfinite(float(cost))
    # anchor stayed fixed
    np.testing.assert_allclose(opt[0], np.asarray(poses0)[0], atol=1e-5)


def test_perfect_graph_stays_put():
    odoms_gt = circle_odoms(12)
    poses0, graph = chain_graph(jnp.asarray(odoms_gt))
    opt, cost = optimize_pose_graph(poses0, graph, iters=5)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(poses0),
                               atol=1e-4)
    assert float(cost) < 1e-8
