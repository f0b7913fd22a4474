"""Voxelizer vs a dict-based numpy oracle (spconv.VoxelGenerator semantics,
see SURVEY.md §2.8)."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu.ops.voxelize import VoxelizerConfig, voxelize

CFG = VoxelizerConfig(
    point_cloud_range=(-4.0, -2.0, -1.0, 4.0, 2.0, 1.0),
    voxel_size=(0.5, 0.5, 0.5),
    max_points=4,
    max_voxels=64,
)


def oracle(points, cfg):
    pr = np.asarray(cfg.point_cloud_range)
    vs = np.asarray(cfg.voxel_size)
    grid = cfg.grid_size
    vox = {}
    for p in points:
        c = np.floor((p[:3] - pr[:3]) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = (c[2], c[1], c[0])
        vox.setdefault(key, []).append(p)
    return vox


def test_voxelize_matches_oracle(rng):
    cfg = CFG._replace(max_voxels=256)
    pts = rng.uniform(-4.5, 4.5, size=(256, 5)).astype(np.float32)
    pts[:, 1] *= 0.5
    pts[:, 2] *= 0.25
    out = voxelize(jnp.asarray(pts), jnp.ones(256, dtype=bool), cfg)
    want = oracle(pts, cfg)
    nv = int(out.num_voxels)
    assert nv == len(want)

    got = {}
    for i in range(nv):
        key = tuple(int(x) for x in np.asarray(out.coords[i]))
        n = int(out.num_points[i])
        got[key] = np.asarray(out.voxels[i][:n])
    assert set(got) == set(want)
    for key in want:
        w = np.stack(want[key][:cfg.max_points])
        np.testing.assert_allclose(np.sort(got[key], axis=0),
                                   np.sort(w, axis=0), atol=1e-6)
    # ids sorted with padding at the end
    ids = np.asarray(out.coords)
    assert np.all(ids[nv:] == -1)


def test_voxelize_respects_point_mask(rng):
    pts = rng.uniform(-1, 1, size=(64, 4)).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:10] = True
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), CFG)
    want = oracle(pts[:10], CFG)
    assert int(out.num_voxels) == len(want)


def test_point_voxel_backref(rng):
    pts = rng.uniform(-1, 1, size=(128, 4)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), jnp.ones(128, dtype=bool), CFG)
    pv = np.asarray(out.point_voxel)
    coords = np.asarray(out.coords)
    pr = np.asarray(CFG.point_cloud_range)
    vs = np.asarray(CFG.voxel_size)
    for i in range(128):
        if pv[i] < 0:
            continue
        c = np.floor((pts[i, :3] - pr[:3]) / vs).astype(int)
        assert tuple(coords[pv[i]]) == (c[2], c[1], c[0])


def test_height_threshold_ground_filter(rng):
    cfg = CFG._replace(height_threshold=0.3, block_size=4)
    # A flat "ground" at z=-0.9 plus some elevated points in one column.
    ground = np.stack([rng.uniform(-3.9, 3.9, 64), rng.uniform(-1.9, 1.9, 64),
                       np.full(64, -0.9), np.zeros(64)], -1).astype(np.float32)
    high = ground.copy()
    high[:, 2] = 0.5
    pts = np.concatenate([ground, high]).astype(np.float32)
    out = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg)
    zs = np.asarray(out.coords)[:int(out.num_voxels), 0]
    # all ground-level voxels (z cell 0) should be filtered out
    assert np.all(zs == np.floor((0.5 - (-1.0)) / 0.5))


def test_voxelize_mean_matches_stack_path(rng):
    """Sort-free mean voxelizer == voxelize + mean when voxels are under
    the point cap."""
    from rslo_tpu.ops.voxelize import voxelize_mean
    cfg = CFG._replace(max_voxels=256, max_points=32)
    pts = rng.uniform(-4.5, 4.5, size=(300, 5)).astype(np.float32)
    pts[:, 1] *= 0.5
    pts[:, 2] *= 0.25
    mask = np.ones(300, bool)
    mask[280:] = False
    a = voxelize(jnp.asarray(pts), jnp.asarray(mask), cfg)
    b = voxelize_mean(jnp.asarray(pts), jnp.asarray(mask), cfg)
    assert int(a.num_voxels) == int(b.num_voxels)
    np.testing.assert_array_equal(np.asarray(a.coords),
                                  np.asarray(b.coords))
    np.testing.assert_array_equal(np.asarray(a.num_points),
                                  np.asarray(b.num_points))
    n = np.maximum(np.asarray(a.num_points)[:, None], 1)
    mean_a = np.asarray(a.voxels).sum(axis=1) / n
    np.testing.assert_allclose(np.asarray(b.features), mean_a, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.point_voxel),
                                  np.asarray(b.point_voxel))


def test_voxelize_mean_capacity_truncation(rng):
    from rslo_tpu.ops.voxelize import voxelize_mean
    cfg = CFG._replace(max_voxels=16)
    pts = rng.uniform(-4.5, 4.5, size=(400, 4)).astype(np.float32)
    pts[:, 1] *= 0.5
    pts[:, 2] *= 0.25
    a = voxelize(jnp.asarray(pts), jnp.ones(400, bool), cfg)
    b = voxelize_mean(jnp.asarray(pts), jnp.ones(400, bool), cfg)
    # same id-ordered truncation policy
    np.testing.assert_array_equal(np.asarray(a.coords),
                                  np.asarray(b.coords))


def test_sorted_mean_matches_list_path_plus_vfe(rng):
    """voxelize_sorted_mean == voxelize + mean VFE, including the
    per-voxel max_points cap and coords/mask/point_voxel."""
    import jax.numpy as jnp
    from rslo_tpu.ops.voxelize import (VoxelizerConfig, voxelize,
                                       voxelize_sorted_mean)
    from rslo_tpu.models.vfe import simple_voxel_xyzi_normal

    cfg = VoxelizerConfig(point_cloud_range=(-4, -4, -1, 4, 4, 1),
                          voxel_size=(0.5, 0.5, 0.5), max_points=3,
                          max_voxels=128)
    pts = rng.uniform(-5, 5, size=(600, 7)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.2, 1.2, size=600)
    mask = rng.random(600) > 0.1
    a = voxelize(jnp.asarray(pts), jnp.asarray(mask), cfg)
    b = voxelize_sorted_mean(jnp.asarray(pts), jnp.asarray(mask), cfg)
    ref_feat = simple_voxel_xyzi_normal(a.voxels, a.num_points, 7)
    got = np.asarray(b.features)
    # normalize the normal columns like the VFE does
    n = got[:, 4:7]
    got = np.concatenate(
        [got[:, :4],
         n / np.sqrt((n * n).sum(-1, keepdims=True) + 1e-16)], axis=-1)
    np.testing.assert_allclose(got, np.asarray(ref_feat),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.coords),
                                  np.asarray(b.coords))
    np.testing.assert_array_equal(np.asarray(a.num_points),
                                  np.asarray(b.num_points))
    np.testing.assert_array_equal(np.asarray(a.point_voxel),
                                  np.asarray(b.point_voxel))
