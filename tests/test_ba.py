"""Bundle adjustment with Schur-complement elimination: noisy poses +
landmarks converge to ground truth; the sharded solver matches."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from rslo_tpu import geometry as G
from rslo_tpu.pgo.ba import BAProblem, solve_ba, solve_ba_sharded


def make_problem(rng, W=6, K=64, noisy=True):
    # ground-truth poses along x with slight yaw
    gt_poses = np.zeros((W, 7), np.float32)
    gt_poses[:, 3] = 1.0
    for i in range(1, W):
        step = np.array([1.0, 0.02, 0.0, np.cos(0.01), 0, 0,
                         np.sin(0.01)], np.float32)
        gt_poses[i] = G.np_compose_pose(gt_poses[i - 1][None],
                                        step[None])[0]
    gt_lms = rng.uniform(-5, 10, size=(K, 3)).astype(np.float32)
    gt_lms[:, 0] += 2.0

    obs_p, obs_l, obs_x, obs_w = [], [], [], []
    for i in range(W):
        inv = G.np_invert_pose(gt_poses[i])
        for j in range(K):
            local = np.asarray(G.transform_points(
                jnp.asarray(inv), jnp.asarray(gt_lms[j][None])))[0]
            obs_p.append(i)
            obs_l.append(j)
            obs_x.append(local + (rng.normal(0, 0.01, 3)
                                  if noisy else 0))
            obs_w.append(1.0)
    O = len(obs_p)

    poses0 = gt_poses.copy()
    lms0 = gt_lms.copy()
    if noisy:
        poses0[1:, :3] += rng.normal(0, 0.1, (W - 1, 3))
        for i in range(1, W):
            qn = np.asarray(G.qexp(jnp.asarray(rng.normal(0, 0.01, 3))))
            poses0[i, 3:] = np.asarray(
                G.qmult(jnp.asarray(poses0[i, 3:]), jnp.asarray(qn)))
        lms0 = lms0 + rng.normal(0, 0.1, lms0.shape).astype(np.float32)

    anchor = np.zeros(W, bool)
    anchor[0] = True
    problem = BAProblem(
        jnp.asarray(poses0), jnp.asarray(lms0),
        jnp.asarray(obs_p, jnp.int32), jnp.asarray(obs_l, jnp.int32),
        jnp.asarray(np.stack(obs_x), jnp.float32),
        jnp.asarray(obs_w, jnp.float32), jnp.asarray(anchor))
    return problem, gt_poses, gt_lms


def test_ba_converges(rng):
    problem, gt_poses, gt_lms = make_problem(rng)
    out, cost = solve_ba(problem, iters=6)
    out_poses = np.asarray(out.poses)
    err0 = np.linalg.norm(np.asarray(problem.poses)[:, :3] -
                          gt_poses[:, :3], axis=1).mean()
    err1 = np.linalg.norm(out_poses[:, :3] - gt_poses[:, :3],
                          axis=1).mean()
    assert err1 < err0 * 0.2, (err0, err1)
    # landmarks recovered too
    lm_err = np.linalg.norm(np.asarray(out.landmarks) - gt_lms,
                            axis=1).mean()
    assert lm_err < 0.05, lm_err
    assert np.isfinite(float(cost))


def test_ba_perfect_is_fixed_point(rng):
    problem, gt_poses, gt_lms = make_problem(rng, noisy=False)
    out, cost = solve_ba(problem, iters=3)
    np.testing.assert_allclose(np.asarray(out.poses)[:, :3],
                               gt_poses[:, :3], atol=1e-3)
    assert float(cost) < 1e-6


def test_ba_sharded_matches(rng):
    """Landmarks sharded over 8 devices: same solution as single-device.

    Observations are grouped so each device's obs reference only its
    landmark shard (local indices)."""
    W, K = 6, 64
    problem, gt_poses, gt_lms = make_problem(rng, W=W, K=K)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    D = 8
    per = K // D
    # reorder observations landmark-major (they already are: obs built
    # j-inner i-outer -> need lm-major grouping)
    op = np.asarray(problem.obs_pose).reshape(W, K)
    ox = np.asarray(problem.obs_xyz).reshape(W, K, 3)
    obs_p = op.T.reshape(-1)                      # lm-major
    obs_x = ox.transpose(1, 0, 2).reshape(-1, 3)
    obs_l = np.repeat(np.arange(K), W)
    # local landmark indices within each shard
    obs_l_local = obs_l % per
    sharded = BAProblem(
        problem.poses, problem.landmarks,
        jnp.asarray(obs_p, jnp.int32),
        jnp.asarray(obs_l_local, jnp.int32),
        jnp.asarray(obs_x), jnp.ones((W * K,), jnp.float32),
        problem.anchor)
    out_poses, out_lms, cost = solve_ba_sharded(sharded, mesh, iters=6)
    ref, _ = solve_ba(BAProblem(
        problem.poses, problem.landmarks,
        jnp.asarray(obs_p, jnp.int32), jnp.asarray(obs_l, jnp.int32),
        jnp.asarray(obs_x), jnp.ones((W * K,), jnp.float32),
        problem.anchor), iters=6)
    np.testing.assert_allclose(np.asarray(out_poses),
                               np.asarray(ref.poses), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_lms),
                               np.asarray(ref.landmarks), atol=2e-3)
