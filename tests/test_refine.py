"""Windowed refinement: redundant noisy pair motions -> lower drift."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu import geometry as G
from rslo_tpu.pgo.refine import fuse_window_odometry, window_pairs_to_edges


def make_trajectory(n=60, rng=None):
    odoms = np.zeros((n, 7), np.float32)
    odoms[:, 3] = 1.0
    odoms[1:, 0] = 1.0          # 1 m/frame forward
    odoms[1:, 6] = 0.01         # slight yaw per frame
    odoms[1:, 3] = np.sqrt(1 - 0.01 ** 2)
    return G.odom_to_abs_pose(odoms)


def test_fuse_reduces_noise(rng):
    gt_abs = make_trajectory(60)
    n = len(gt_abs)
    # windows of 3 frames, pair offsets (0,1), (0,2), (1,2)
    offsets = [(0, 1), (0, 2), (1, 2)]
    starts = list(range(0, n - 2))
    preds = []
    for s in starts:
        rowm = []
        for (i, j) in offsets:
            m = G.np_calc_vo(gt_abs[s + i:s + i + 1],
                             gt_abs[s + j:s + j + 1])[0]
            m = m.astype(np.float32)
            m[:3] += rng.normal(0, 0.03, 3)
            q_noise = np.asarray(G.qexp(jnp.asarray(
                rng.normal(0, 0.003, 3))), np.float32)
            m[3:] = np.asarray(G.qmult(jnp.asarray(m[3:]),
                                       jnp.asarray(q_noise)))
            rowm.append(m)
        preds.append(np.stack(rowm))
    preds = np.stack(preds)

    E, M, W = window_pairs_to_edges(starts, offsets, preds)
    refined = fuse_window_odometry(E, M, n, W, window=32, overlap=8,
                                   iters=8)

    # baseline: chain only the consecutive (i, i+1) edges
    chain = np.zeros((n, 7), np.float32)
    chain[:, 3] = 1.0
    lookup = {tuple(e): k for k, e in enumerate(E)}
    for i in range(n - 1):
        chain[i + 1] = M[lookup[(i, i + 1)]]
    chain_abs = G.odom_to_abs_pose(chain)

    err_chain = np.linalg.norm(chain_abs[-1, :3] - gt_abs[-1, :3])
    err_ref = np.linalg.norm(refined[-1, :3] - gt_abs[-1, :3])
    assert np.isfinite(err_ref)
    # redundant skip-2 edges must reduce endpoint drift
    assert err_ref < err_chain, (err_chain, err_ref)
