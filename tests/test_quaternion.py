"""Geometry unit tests: quaternion algebra round-trips vs homogeneous
matrices (modeled on the reference's inline tests,
/root/reference/rslo/utils/pose_utils.py:1255-1341)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rslo_tpu import geometry as G


def random_pose(rng, n=16):
    t = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1] + 1e-30)
    return np.concatenate([t, q], axis=-1)


def pose_to_mat(p):
    out = np.zeros(p.shape[:-1] + (4, 4))
    for idx in np.ndindex(p.shape[:-1]):
        out[idx] = G.expand_rigid(G.tq_to_RT(p[idx]))
    return out


def test_qmult_matches_matrix_product(rng):
    q1 = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(8, 4)))))
    q2 = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(8, 4)))))
    q12 = np.asarray(G.qmult(jnp.asarray(q1), jnp.asarray(q2)))
    for i in range(8):
        m = G.quat_to_matrix_np(q1[i]) @ G.quat_to_matrix_np(q2[i])
        np.testing.assert_allclose(G.quat_to_matrix_np(q12[i]), m, atol=1e-5)


def test_compose_invert_roundtrip(rng):
    p1, p2 = random_pose(rng), random_pose(rng)
    p12 = np.asarray(G.compose_pose(jnp.asarray(p1), jnp.asarray(p2)))
    m12 = pose_to_mat(p1) @ pose_to_mat(p2)
    np.testing.assert_allclose(pose_to_mat(p12), m12, atol=1e-4)

    pinv = np.asarray(G.invert_pose(jnp.asarray(p1)))
    ident = pose_to_mat(p1) @ pose_to_mat(pinv)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), ident.shape),
                               atol=1e-4)


def test_calc_vo_definition(rng):
    p0, p1 = random_pose(rng), random_pose(rng)
    vo = np.asarray(G.calc_vo(jnp.asarray(p0), jnp.asarray(p1)))
    # p0 ∘ vo == p1
    re = np.asarray(G.compose_pose(jnp.asarray(p0), jnp.asarray(vo)))
    np.testing.assert_allclose(pose_to_mat(re), pose_to_mat(p1), atol=1e-4)


def test_np_and_jax_pose_ops_agree(rng):
    p0, p1 = random_pose(rng), random_pose(rng)
    np.testing.assert_allclose(
        G.np_calc_vo(p0, p1),
        np.asarray(G.calc_vo(jnp.asarray(p0), jnp.asarray(p1))), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(32, 4)))))
    m = np.asarray(G.quat_to_matrix(jnp.asarray(q)))
    q2 = np.asarray(G.matrix_to_quat(jnp.asarray(m)))
    # same rotation up to sign
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_qexp_qlog_roundtrip(rng):
    v = rng.normal(size=(16, 3)) * 0.5
    q = np.asarray(G.qexp(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
    v2 = np.asarray(G.qlog(jnp.asarray(q)))
    np.testing.assert_allclose(v, v2, atol=1e-5)


def test_rotate_vec_matches_matrix(rng):
    q = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(8, 4)))))
    t = rng.normal(size=(8, 3))
    r1 = np.asarray(G.rotate_vec_by_q(jnp.asarray(t), jnp.asarray(q)))
    for i in range(8):
        np.testing.assert_allclose(r1[i], G.quat_to_matrix_np(q[i]) @ t[i],
                                   atol=1e-5)


def test_slerp_endpoints(rng):
    q0 = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(4, 4)))))
    q1 = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(4, 4)))))
    s0 = np.asarray(G.slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
    s1 = np.asarray(G.slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
    np.testing.assert_allclose(np.abs(np.sum(s0 * q0, -1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(s1 * q1, -1)), 1.0, atol=1e-5)


def test_odom_to_abs_pose_chain(rng):
    odoms = random_pose(rng, 5)
    odoms[0] = np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
    abs_poses = G.odom_to_abs_pose(odoms)
    m = np.eye(4)
    for i in range(1, 5):
        m = m @ pose_to_mat(odoms[i])
        np.testing.assert_allclose(pose_to_mat(abs_poses[i]), m, atol=1e-4)


def test_kabsch_recovers_rigid_transform(rng):
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
    q = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(2, 4)))))
    R_true = np.asarray(G.quat_to_matrix(jnp.asarray(q)))
    t_true = rng.normal(size=(2, 3)).astype(np.float32)
    tgt = np.einsum('bij,bnj->bni', R_true, pts) + t_true[:, None]
    w = np.abs(rng.normal(size=(2, 64))).astype(np.float32)
    # src = R @ tgt + t convention: src=pts, so returned transform maps tgt->pts
    R, t = G.weighted_kabsch(jnp.asarray(pts), jnp.asarray(tgt), jnp.asarray(w))
    R, t = np.asarray(R), np.asarray(t)
    rec = np.einsum('bij,bnj->bni', R, tgt) + t[:, None]
    np.testing.assert_allclose(rec, pts, atol=1e-3)


def test_kabsch_ignores_zero_weight_outliers(rng):
    pts = rng.normal(size=(1, 32, 3)).astype(np.float32)
    q = np.asarray(G.qexp(jnp.asarray(rng.normal(size=(1, 3)) * 0.2)))
    R_true = np.asarray(G.quat_to_matrix(jnp.asarray(q)))
    t_true = rng.normal(size=(1, 3)).astype(np.float32)
    tgt = np.einsum('bij,bnj->bni', R_true, pts) + t_true[:, None]
    # corrupt half the correspondences, weight them 0
    tgt_bad = tgt.copy()
    tgt_bad[:, 16:] += 100.0
    w = np.ones((1, 32), np.float32)
    w[:, 16:] = 0.0
    R, t = G.weighted_kabsch(jnp.asarray(pts), jnp.asarray(tgt_bad),
                             jnp.asarray(w))
    rec = np.einsum('bij,bnj->bni', np.asarray(R), tgt) + np.asarray(t)[:, None]
    np.testing.assert_allclose(rec, pts, atol=1e-3)


def test_tq_map_roundtrip(rng):
    pc_range = np.array([-70.4, -38.4, -3, 70.4, 38.4, 5], np.float32)
    tq = random_pose(rng, 3)
    tq[:, :3] *= 0.5
    m = G.generate_tq_map(jnp.asarray(tq), (12, 22), pc_range)  # (3,12,22,7)
    assert m.shape == (3, 12, 22, 7)
    dec = np.asarray(G.decode_tq_map(m, pc_range))
    # every cell should decode back to the global pose
    for b in range(3):
        np.testing.assert_allclose(
            dec[b], np.broadcast_to(tq[b], dec[b].shape), atol=1e-4)


def test_tq_map_roundtrip_3d_and_warped(rng):
    """Cubic/3D tq maps + the inverse-distance anchor warp (reference
    kitti_dataset_hdf5.py:511-631) must stay exactly invertible."""
    pc_range = np.array([-70.4, -38.4, -3, 70.4, 38.4, 5], np.float32)
    tq = random_pose(rng, 2)
    tq[:, :3] *= 0.5
    m3 = G.generate_tq_map(jnp.asarray(tq), (12, 22, 5), pc_range)
    assert m3.shape == (2, 12, 22, 5, 7)
    dec3 = np.asarray(G.decode_tq_map(m3, pc_range, dims=3))
    for b in range(2):
        np.testing.assert_allclose(
            dec3[b], np.broadcast_to(tq[b], dec3[b].shape), atol=1e-4)
    # warped anchors round-trip through the same factor
    mw = G.generate_tq_map(jnp.asarray(tq), (12, 22), pc_range,
                           inv_trans_factor=30.0)
    decw = np.asarray(G.decode_tq_map(mw, pc_range,
                                      inv_trans_factor=30.0))
    for b in range(2):
        np.testing.assert_allclose(
            decw[b], np.broadcast_to(tq[b], decw[b].shape), atol=1e-4)
    # and the warped map differs from the unwarped one
    m = np.asarray(G.generate_tq_map(jnp.asarray(tq), (12, 22),
                                     pc_range))
    assert np.abs(m - np.asarray(mw)).max() > 1e-3


def test_grid_cell_coords_origin():
    pc_range = np.array([-70.4, -38.4, -3, 70.4, 38.4, 5], np.float32)
    c = np.asarray(G.grid_cell_coords((96, 176), pc_range))
    assert c.shape == (96, 176, 3)
    # world x increases along W, y decreases along H
    assert c[0, 1, 0] > c[0, 0, 0]
    assert c[1, 0, 1] < c[0, 0, 1]
    # origin cell: fractional origin maps world 0 to grid position
    ox = (0 - pc_range[0]) / (pc_range[3] - pc_range[0]) * 176
    np.testing.assert_allclose(c[0, int(ox), 0], 0.0, atol=1e-5)
