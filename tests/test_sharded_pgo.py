"""Sharded windowed refinement: mesh-parallel solves reduce drift like
the sequential path."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rslo_tpu import geometry as G
from rslo_tpu.pgo.refine import window_pairs_to_edges
from rslo_tpu.pgo.sharded import fuse_windows_sharded


def test_sharded_fuse_reduces_noise(rng):
    from tests_helpers_traj import make_traj  # local helper below
    gt_abs = make_traj(80)
    n = len(gt_abs)
    offsets = [(0, 1), (0, 2), (1, 2)]
    starts = list(range(0, n - 2))
    preds = []
    for s in starts:
        rows = []
        for (i, j) in offsets:
            m = G.np_calc_vo(gt_abs[s + i:s + i + 1],
                             gt_abs[s + j:s + j + 1])[0].astype(np.float32)
            m[:3] += rng.normal(0, 0.03, 3)
            qn = np.asarray(G.qexp(jnp.asarray(rng.normal(0, 0.003, 3))),
                            np.float32)
            m[3:] = np.asarray(G.qmult(jnp.asarray(m[3:]),
                                       jnp.asarray(qn)))
            rows.append(m)
        preds.append(np.stack(rows))
    preds = np.stack(preds)
    E, M, W = window_pairs_to_edges(starts, offsets, preds)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    refined = fuse_windows_sharded(E, M, n, W, window=32, overlap=8,
                                   iters=8, mesh=mesh)

    chain = np.zeros((n, 7), np.float32)
    chain[:, 3] = 1.0
    lookup = {tuple(e): k for k, e in enumerate(E)}
    for i in range(n - 1):
        chain[i + 1] = M[lookup[(i, i + 1)]]
    chain_abs = G.odom_to_abs_pose(chain)

    err_chain = np.linalg.norm(chain_abs[-1, :3] - gt_abs[-1, :3])
    err_ref = np.linalg.norm(refined[-1, :3] - gt_abs[-1, :3])
    assert np.isfinite(err_ref)
    assert err_ref < err_chain, (err_chain, err_ref)
