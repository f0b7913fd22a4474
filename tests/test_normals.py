"""Normal estimation: native C++ grid-hash vs scipy oracle vs analytic
ground truth on planar scenes."""
import numpy as np
import pytest

from rslo_tpu.data import normals as N


@pytest.fixture(scope="module")
def plane_cloud():
    rng = np.random.default_rng(3)
    # tilted plane z = 0.3x - 0.2y + noise
    xy = rng.uniform(-5, 5, size=(4000, 2))
    z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1]
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts += rng.normal(0, 0.005, pts.shape).astype(np.float32)
    n_true = np.array([-0.3, 0.2, 1.0])
    n_true /= np.linalg.norm(n_true)
    return pts, n_true


def _check(normals, pts, n_true):
    # normals should match the plane normal up to sign; orientation is
    # toward the origin
    dots = np.abs(normals @ n_true)
    assert np.mean(dots > 0.99) > 0.95, np.mean(dots)
    orient = np.sum(normals * pts, axis=1)
    assert np.mean(orient <= 1e-6) > 0.99


def test_scipy_fallback_plane(plane_cloud):
    pts, n_true = plane_cloud
    native = N._load_native()
    try:
        N._NATIVE = False  # force the scipy path
        normals = N.estimate_normals(pts, radius=0.6, k=30)
    finally:
        N._NATIVE = native
    _check(normals, pts, n_true)


def test_native_plane(plane_cloud):
    if not N._load_native():
        pytest.skip("libprep.so not built")
    pts, n_true = plane_cloud
    normals = N.estimate_normals(pts, radius=0.6, k=30)
    _check(normals, pts, n_true)


def test_native_matches_scipy(plane_cloud):
    if not N._load_native():
        pytest.skip("libprep.so not built")
    pts, _ = plane_cloud
    nat = N.estimate_normals(pts, radius=0.6, k=30)
    native = N._load_native()
    try:
        N._NATIVE = False
        sci = N.estimate_normals(pts, radius=0.6, k=30)
    finally:
        N._NATIVE = native
    # same line (sign-insensitive agreement)
    dots = np.abs(np.sum(nat * sci, axis=1))
    assert np.mean(dots > 0.98) > 0.9, np.mean(dots)


def test_voxel_downsample_reduces_and_averages():
    pts = np.array([[0.01, 0.01, 0.01, 1.0],
                    [0.02, 0.02, 0.02, 3.0],
                    [0.9, 0.9, 0.9, 5.0]], np.float32)
    out = N.voxel_downsample(pts, 0.1)
    assert out.shape == (2, 4)
    row = out[np.argmin(out[:, 0])]
    np.testing.assert_allclose(row[3], 2.0, atol=1e-6)
