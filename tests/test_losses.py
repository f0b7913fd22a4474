"""Loss-behavior unit tests (SURVEY.md §4 strategy: identity transform =>
near-zero consistency; adaptive loss reduces to exp(-a)l + a)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rslo_tpu.losses.adaptive import (adaptive_weighted_l2,
                                      adaptive_weighted_l2_rmatrix, l2_loss)
from rslo_tpu.losses.consistency import (consistency_loss_pairs, inv3x3,
                                         roi_gate, span_cov)
from rslo_tpu import geometry as G


def test_adaptive_l2_closed_form(rng):
    pred = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    alpha = jnp.float32(0.7)
    got = float(adaptive_weighted_l2(pred, tgt, alpha))
    per_sample = np.mean(np.asarray(pred - tgt) ** 2, axis=1)
    # gamma=0 -> focal weights 1/B each... no: w = 1/sum(1)=1/B? focal_w =
    # scaled**0 = ones; normalized -> 1/B each; sum(w*scaled) = mean
    want = np.exp(-0.7) * per_sample.mean() / 1.0
    want = (np.exp(-0.7) * per_sample / len(per_sample)).sum() + 0.7
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_adaptive_l2_mask(rng):
    pred = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
    tgt = pred.at[:, :4].add(1.0)  # error only on first half
    mask = jnp.zeros((2, 8, 1)).at[:, 4:].set(1.0)
    got = float(adaptive_weighted_l2(pred, tgt, jnp.float32(0.0),
                                     mask=mask))
    # masked region has zero error -> loss == alpha == 0
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_rmatrix_loss_zero_at_same_rotation(rng):
    q = np.asarray(G.qnormalize(jnp.asarray(rng.normal(size=(4, 4)))))
    got = float(adaptive_weighted_l2_rmatrix(jnp.asarray(q), jnp.asarray(q),
                                             jnp.float32(0.0)))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_span_cov_spd(rng):
    params = rng.normal(size=(16, 7)).astype(np.float32)
    params[:, :3] = np.abs(params[:, :3]) + 0.1
    S = np.asarray(span_cov(jnp.asarray(params)))
    # symmetric positive definite
    np.testing.assert_allclose(S, np.swapaxes(S, 1, 2), atol=1e-5)
    eig = np.linalg.eigvalsh(S)
    assert np.all(eig > 0)
    # eigenvalues are the cumulative sums
    want = np.sort(np.stack([params[:, 0], params[:, 0] + params[:, 1],
                             params[:, 0] + params[:, 1] + params[:, 2]],
                            -1), axis=-1)
    np.testing.assert_allclose(np.sort(eig, -1), want, rtol=1e-4)


def test_inv3x3_matches_numpy(rng):
    A = rng.normal(size=(8, 3, 3)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2) + 0.5 * np.eye(3)
    inv, det = inv3x3(jnp.asarray(M), eps=0.0)
    np.testing.assert_allclose(np.asarray(det), np.linalg.det(M), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(M),
                               rtol=1e-2, atol=1e-4)


def test_roi_gate_excludes_far_points():
    dist = jnp.asarray(np.concatenate([np.full(90, 0.5),
                                       np.full(10, 50.0)]).astype(np.float32))
    valid = jnp.ones(100, bool)
    roi = np.asarray(roi_gate(dist, valid, 0.9))
    assert roi[:90].all()
    assert not roi[90:].any()
    # threshold floor of 1.0: small distances always kept
    roi2 = np.asarray(roi_gate(dist * 0.001, valid, 0.5))
    assert roi2.all()


@pytest.mark.slow
def test_consistency_identity_small(rng):
    """Same cloud, identity transform: ICP correction ~ identity, data
    term ~ 0 (Mahalanobis of zero residuals)."""
    N = 512
    pts = rng.uniform(-10, 10, size=(N, 3)).astype(np.float32)
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    cov = np.zeros((N, 7), np.float32)
    cov[:, :3] = 1.0
    cov[:, 3] = 1.0
    mask = np.ones(N, bool)
    I = np.eye(3, dtype=np.float32)
    loss, res_R, res_t = consistency_loss_pairs(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        jnp.asarray(nrm[None]), jnp.asarray(cov[None]),
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        jnp.asarray(cov[None]), jnp.asarray(I[None]),
        jnp.zeros((1, 3)), penalize_ratio=0.97, reg_weight=0.005,
        icp_iter=2)
    assert abs(float(loss)) < 0.1      # only the log-det regularizer left
    np.testing.assert_allclose(np.asarray(res_R)[0], I, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_t)[0], 0.0, atol=1e-3)


def test_consistency_icp_recovers_offset(rng):
    """Target cloud offset by a small translation: res_t should recover
    it (correction maps tgt -> src)."""
    N = 1024
    pts = (rng.uniform(-20, 20, size=(N, 3)) *
           np.array([1, 1, 0.1])).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (N, 1))
    cov = np.zeros((N, 7), np.float32)
    cov[:, :3] = 1.0
    cov[:, 3] = 1.0
    mask = np.ones(N, bool)
    off = np.array([0.08, -0.05, 0.02], np.float32)
    tgt = pts + off
    I = np.eye(3, dtype=np.float32)
    loss, res_R, res_t = consistency_loss_pairs(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        jnp.asarray(nrm[None]), jnp.asarray(cov[None]),
        jnp.asarray(tgt[None]), jnp.asarray(mask[None]),
        jnp.asarray(cov[None]), jnp.asarray(I[None]),
        jnp.zeros((1, 3)), penalize_ratio=0.97, reg_weight=0.005,
        icp_iter=3)
    # exact same point set shifted: NN association is exact, one Kabsch
    # solves it
    np.testing.assert_allclose(np.asarray(res_t)[0], -off, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_R)[0], I, atol=1e-3)


def test_consistency_no_cov_recovers_offset(rng):
    """hier-points fallback (cov=None): plain-L2 consistency still
    recovers a translation offset through the inner ICP."""
    N = 1024
    pts = (rng.uniform(-20, 20, size=(N, 3)) *
           np.array([1, 1, 0.1])).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (N, 1))
    mask = np.ones(N, bool)
    off = np.array([0.08, -0.05, 0.02], np.float32)
    tgt = pts + off
    I = np.eye(3, dtype=np.float32)
    loss, res_R, res_t = consistency_loss_pairs(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        jnp.asarray(nrm[None]), None,
        jnp.asarray(tgt[None]), jnp.asarray(mask[None]),
        None, jnp.asarray(I[None]),
        jnp.zeros((1, 3)), penalize_ratio=0.97, reg_weight=0.005,
        icp_iter=3)
    np.testing.assert_allclose(np.asarray(res_t)[0], -off, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_R)[0], I, atol=1e-3)
    assert np.isfinite(float(loss))
    # no log-det regularizer: identical clouds => loss ~ |off|^2 scale,
    # strictly >= 0 (no negative logdet contributions)
    assert float(loss) >= 0.0


def test_multi_pred_consistency_composes(rng):
    """Per-pyramid-level consistency (voxel_odom_net.py:670-725): with
    two identical prediction levels the residuals compose and the
    weighted loss uses the weight tail [0.1, 1]."""
    from rslo_tpu.config.schema import LossCfg
    from rslo_tpu.losses.objective import compute_objective

    N = 512
    pts = (rng.uniform(-10, 10, size=(N, 3)) *
           np.array([1, 1, 0.1])).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (N, 1))
    feats = jnp.asarray(np.concatenate(
        [pts, np.zeros((N, 1), np.float32), nrm], axis=1))  # (N,7)
    cov = np.zeros((N, 7), np.float32)
    cov[:, :3] = 1.0
    cov[:, 3] = 1.0
    off = np.array([0.06, -0.04, 0.0], np.float32)
    pts2 = pts - off    # frame 2 shifted; true motion maps 2 -> 1
    feats2 = jnp.asarray(np.concatenate(
        [pts2, np.zeros((N, 1), np.float32), nrm], axis=1))

    odom = np.zeros((1, 7), np.float32)
    odom[0, 3] = 1.0
    H = W = 8
    preds = {
        "odometry": jnp.asarray(odom),
        "odometry_levels": [jnp.asarray(odom), jnp.asarray(odom)],
        "voxel_features": [feats, feats2],
        "voxel_covs": [jnp.asarray(cov), jnp.asarray(cov)],
        "voxel_masks": [jnp.ones(N, bool)] * 2,
        "seq_length": 2,
        "pyramid": [],
    }
    cfg = LossCfg(max_loss_points=N, icp_iter=2)
    out = compute_objective(preds, {}, {"rot": jnp.float32(0.0),
                                        "trans": jnp.float32(0.0)},
                            cfg, (-10, -10, -1, 10, 10, 1),
                            warmup=False, self_supervised=True)
    assert np.isfinite(float(out.total))
    # single-level run for comparison
    preds1 = dict(preds)
    preds1["odometry_levels"] = [jnp.asarray(odom)]
    out1 = compute_objective(preds1, {}, {"rot": jnp.float32(0.0),
                                          "trans": jnp.float32(0.0)},
                             cfg, (-10, -10, -1, 10, 10, 1),
                             warmup=False, self_supervised=True)
    # identical levels: raw consistency scales by (0.1 + 1)/1
    np.testing.assert_allclose(float(out.aux["consistency_loss"]),
                               1.1 * float(out1.aux["consistency_loss"]),
                               rtol=1e-4)
