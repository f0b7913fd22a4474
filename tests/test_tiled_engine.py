"""Tiled dense engine vs rulebook engine equivalence.

Both engines implement the exact same SpMiddleFHDWithCov2_3
architecture (reference /root/reference/rslo/models/middle.py:119-244)
over one shared parameter tree; with ample capacities their outputs
must agree to float-accumulation order."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rslo_tpu.config.schema import MiddleCfg
from rslo_tpu.models.middle import (SparseMiddleCov, build_geometry,
                                    build_tiled_geometry)

GRID = (41, 64, 64)          # (nz, ny, nx) incl. the +1 z pad
CAPS = (4096, 6144, 4096, 2048)   # ample: no level may overflow, the
                                  # engines differ under overflow policy
TCAPS = (2048, 256)


def _random_frame(rng, n=1500, pad=200):
    nz, ny, nx = GRID
    ids = rng.choice(nz * ny * nx, size=n, replace=False)
    ids = np.sort(ids)           # voxelizer emits id-sorted streams
    z = ids // (ny * nx)
    y = (ids // nx) % ny
    x = ids % nx
    coords = np.stack([z, y, x], -1).astype(np.int32)
    coords = np.concatenate(
        [coords, np.full((pad, 3), -1, np.int32)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    feats = rng.normal(size=(n + pad, 7)).astype(np.float32)
    feats[~mask] = 0
    return jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(feats)


def _run_both(bn_type: str, train: bool, seed=0):
    rng = np.random.default_rng(seed)
    coords, mask, feats = _random_frame(rng)
    cfg = MiddleCfg(bn_type=bn_type, channels=(8, 8, 16, 16),
                    level_capacities=CAPS, tile_capacities=TCAPS,
                    remat=False, conv_dtype="f32")  # float-accum order
                    # comparison: the tiled engine computes in f32
    net = SparseMiddleCov(cfg)
    geo_rb = build_geometry(coords, mask, GRID, CAPS)
    geo_tl = build_tiled_geometry(coords, mask, GRID, TCAPS)
    variables = net.init(jax.random.PRNGKey(0), feats, geo_rb, False)

    def apply(geo):
        return net.apply(variables, feats, geo, train,
                         mutable=["batch_stats"] if train else [])

    (bev_a, cov_a), _ = apply(geo_rb)
    (bev_b, cov_b), _ = apply(geo_tl)
    return map(np.asarray, (bev_a, cov_a, bev_b, cov_b))


@pytest.mark.slow
def test_tiled_matches_rulebook_eval():
    bev_a, cov_a, bev_b, cov_b = _run_both("none", train=False)
    assert bev_a.shape == bev_b.shape
    np.testing.assert_allclose(bev_b, bev_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(cov_b, cov_a, rtol=2e-4, atol=2e-4)


def test_tiled_matches_rulebook_train_bn():
    """Batch-norm stats are computed over active sites only — the occ
    masks must count exactly the rulebook's active voxels."""
    bev_a, cov_a, bev_b, cov_b = _run_both("bn", train=True)
    np.testing.assert_allclose(bev_b, bev_a, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(cov_b, cov_a, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_tiled_gradients_finite():
    rng = np.random.default_rng(1)
    coords, mask, feats = _random_frame(rng, n=800, pad=100)
    cfg = MiddleCfg(bn_type="none", channels=(8, 8, 16, 16),
                    level_capacities=CAPS, tile_capacities=TCAPS,
                    remat=False)
    net = SparseMiddleCov(cfg)
    geo = build_tiled_geometry(coords, mask, GRID, TCAPS)
    variables = net.init(jax.random.PRNGKey(0), feats, geo, False)

    def loss(params):
        (bev, cov), _ = net.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            feats, geo, True, mutable=["batch_stats"])
        return jnp.sum(bev ** 2) * 1e-3 + jnp.sum(cov ** 2) * 1e-3

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda a: jnp.all(jnp.isfinite(a)), g))
    assert all(bool(f) for f in flat)
    # some gradient must actually flow
    norms = jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).sum()), g))
    assert sum(norms) > 0
