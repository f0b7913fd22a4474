"""KITTI metric evaluator: perfect prediction => zero error; known
corruption => measurable error."""
import numpy as np

from rslo_tpu.eval.kitti_odometry import (evaluate_sequence,
                                          sequence_errors)
from rslo_tpu import geometry as G


def straight_trajectory(n=1500, step=1.0):
    """Forward motion along x at `step` m/frame."""
    odoms = np.zeros((n, 7), np.float32)
    odoms[:, 3] = 1.0
    odoms[1:, 0] = step
    return G.odom_to_abs_pose(odoms)


def test_perfect_prediction_zero_error():
    gt = straight_trajectory()
    out = evaluate_sequence(gt, gt)
    assert out["n_segments"] > 0
    assert out["t_rel_pct"] < 1e-6
    assert out["r_rel_deg_per_100m"] < 1e-6


def test_translation_scale_error():
    gt = straight_trajectory(step=1.0)
    pred = straight_trajectory(step=0.98)  # 2% scale error
    out = evaluate_sequence(pred, gt)
    np.testing.assert_allclose(out["t_rel_pct"], 2.0, atol=0.1)
    assert out["r_rel_deg_per_100m"] < 1e-6


def test_segment_definition_matches_devkit():
    gt = straight_trajectory(n=1050)
    errs = sequence_errors(gt, gt)
    # 1049 m of trajectory; starts every 10 frames; segment 100 m valid
    # from starts 0..~940
    lens = {e[3] for e in errs}
    assert 100 in lens and 800 in lens
    firsts = sorted({e[0] for e in errs})
    assert firsts[0] == 0 and firsts[1] == 10


def test_ate_zero_for_perfect():
    gt = straight_trajectory()
    out = evaluate_sequence(gt, gt)
    assert out["ate_rmse_m"] < 1e-9


def test_ate_alignment_removes_rigid_offset():
    from rslo_tpu.geometry import ate_rmse
    gt = straight_trajectory(200)
    pred = gt.copy()
    pred[:, 0] += 5.0     # constant offset: alignment removes it
    assert ate_rmse(pred, gt) < 1e-6
    assert ate_rmse(pred, gt, align=False) > 4.9


def test_umeyama_recovers_similarity(rng=None):
    import numpy as _np
    from rslo_tpu.geometry import umeyama_alignment, quat_to_matrix_np
    rng = _np.random.default_rng(0)
    src = rng.normal(size=(100, 3))
    q = rng.normal(size=4); q /= _np.linalg.norm(q)
    R = quat_to_matrix_np(q)
    dst = 2.5 * (R @ src.T).T + _np.array([1., -2., 3.])
    c, R2, t2 = umeyama_alignment(src, dst, with_scale=True)
    _np.testing.assert_allclose(c, 2.5, rtol=1e-6)
    _np.testing.assert_allclose(R2, R, atol=1e-8)
