"""Host-side point-cloud normal estimation + voxel downsampling.

Replaces the reference's open3d preprocessing
(/root/reference/script/create_hdf5.py:130-165, 337-347): kNN-PCA
normals (radius-capped, k=30) oriented toward the sensor, and voxel-grid
downsampled "hierarchical" clouds.  A C++ fast path (native/prep.cpp,
grid-hash neighbor search) is used when the shared library is built;
scipy cKDTree otherwise.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_NATIVE = None


def _load_native():
    """Load native/libprep.so, building it from prep.cpp on demand.

    The binary is NOT committed (a prebuilt .so can't be verified
    against the source and may carry host-specific instructions); it is
    compiled here with a portable baseline arch on first use and cached
    next to the source.  Any failure falls back to the scipy path.
    """
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    native_dir = Path(__file__).resolve().parents[2] / "native"
    lib = native_dir / "libprep.so"
    src = native_dir / "prep.cpp"
    if not lib.exists() or (src.exists()
                            and src.stat().st_mtime > lib.stat().st_mtime):
        if src.exists():
            import subprocess
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=x86-64-v2", "-fPIC",
                     "-std=c++17", "-pthread", "-shared",
                     "-o", str(lib) + ".tmp", str(src)],
                    check=True, capture_output=True, timeout=120)
                Path(str(lib) + ".tmp").replace(lib)  # atomic publish
            except Exception:
                _NATIVE = False
                return _NATIVE
    if lib.exists():
        try:
            n = ctypes.CDLL(str(lib))
            n.estimate_normals.restype = None
            n.estimate_normals.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            _NATIVE = n
        except OSError:
            _NATIVE = False
    else:
        _NATIVE = False
    return _NATIVE


def estimate_normals(xyz: np.ndarray, radius: float = 0.6,
                     k: int = 30) -> np.ndarray:
    """(N, 3) -> (N, 3) unit normals oriented toward the origin (sensor),
    matching open3d's camera-orientation convention used by the
    reference (create_hdf5.py:130-147)."""
    xyz = np.ascontiguousarray(xyz[:, :3], np.float32)
    n = len(xyz)
    native = _load_native()
    if native:
        out = np.empty((n, 3), np.float32)
        native.estimate_normals(
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(radius), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    from scipy.spatial import cKDTree
    tree = cKDTree(xyz)
    dist, idx = tree.query(xyz, k=min(k, n), workers=-1)
    nb = xyz[idx]                                   # (N, k, 3)
    valid = dist <= radius
    valid[:, 0] = True
    w = valid[..., None].astype(np.float32)
    cnt = np.maximum(w.sum(1), 1.0)
    mean = (nb * w).sum(1) / cnt
    d = (nb - mean[:, None]) * w
    cov = np.einsum('nki,nkj->nij', d, d) / cnt[..., :1, None]
    # smallest-eigenvector of each 3x3 covariance
    eigval, eigvec = np.linalg.eigh(cov)
    normals = eigvec[:, :, 0]
    # orient toward sensor at origin
    flip = np.sum(normals * xyz, axis=1) > 0
    normals[flip] *= -1
    nrm = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(nrm, 1e-12)).astype(np.float32)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Voxel-grid average downsample of (N, F) points (xyz in cols 0:3),
    averaging all feature columns per cell (open3d voxel_down_sample
    analog, create_hdf5.py:337-347)."""
    keys = np.floor(points[:, :3] / voxel).astype(np.int64)
    # dict-free unique via lexsort
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    k = keys[order]
    p = points[order]
    head = np.ones(len(k), bool)
    head[1:] = np.any(k[1:] != k[:-1], axis=1)
    group = np.cumsum(head) - 1
    n_groups = group[-1] + 1 if len(group) else 0
    sums = np.zeros((n_groups, points.shape[1]), np.float64)
    np.add.at(sums, group, p)
    counts = np.bincount(group, minlength=n_groups)[:, None]
    out = (sums / np.maximum(counts, 1)).astype(np.float32)
    # renormalize normal columns if present (cols 3:6 or 4:7 by caller)
    return out
