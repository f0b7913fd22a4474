"""Speed profiles of the raycast-proxy trajectory generator.

The "varied" profile exists because a near-constant per-sequence speed
trains a magnitude-compressed translation head (BENCH_NOTES round 2,
diag_pairtypes); KITTI itself spans 0-~23 m/s within a sequence.
"""
import numpy as np

from rslo_tpu.utils.world import synth_trajectory


def _frame_speeds(poses, dt=0.1):
    d = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    return d / dt


def test_walk_profile_near_constant():
    poses = synth_trajectory(seed=5, n_frames=400, pattern="curve",
                             speed=8.0)
    v = _frame_speeds(poses)
    assert np.all(v >= 8.0 * 0.5 - 1e-6) and np.all(v <= 8.0 * 1.5 + 1e-6)
    # low relative spread: the regression prior the varied profile breaks
    assert np.std(v) / np.mean(v) < 0.25


def test_varied_profile_magnitude_diversity():
    poses = synth_trajectory(seed=5, n_frames=700, pattern="curve",
                             speed=8.0, speed_profile="varied")
    v = _frame_speeds(poses)
    assert np.all(np.isfinite(poses))
    # wide in-sequence range: clearly sub-half-speed and above-nominal
    # segments both occur, with substantial overall spread
    assert v.min() < 3.0, v.min()
    assert v.max() > 9.0, v.max()
    assert np.std(v) / np.mean(v) > 0.4
    # accel limit: |dv| per frame <= 2 m/s^2 * dt + walk noise
    dv = np.abs(np.diff(v))
    assert np.percentile(dv, 99) < 2.0 * 0.1 + 0.25


def test_varied_profile_deterministic_and_loop_unchanged():
    a = synth_trajectory(seed=3, n_frames=100, pattern="curve",
                         speed=8.0, speed_profile="varied")
    b = synth_trajectory(seed=3, n_frames=100, pattern="curve",
                         speed=8.0, speed_profile="varied")
    np.testing.assert_array_equal(a, b)
    # loops ignore the varied profile (closure timing must hold)
    la = synth_trajectory(seed=3, n_frames=100, pattern="loop",
                          speed=8.0, speed_profile="varied")
    lb = synth_trajectory(seed=3, n_frames=100, pattern="loop",
                          speed=8.0)
    np.testing.assert_array_equal(la, lb)
