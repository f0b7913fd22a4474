"""inverse_warp correctness + pillar middle variant integration."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rslo_tpu.geometry.warp import bilinear_sample, inverse_warp
from rslo_tpu import geometry as G


def test_bilinear_sample_identity(rng):
    img = jnp.asarray(rng.normal(size=(8, 10, 3)).astype(np.float32))
    yy, xx = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0),
                          indexing="ij")
    xy = jnp.stack([xx, yy], -1)
    out = bilinear_sample(img, xy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               atol=1e-6)


def test_bilinear_sample_interpolates():
    img = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0)
    v = bilinear_sample(img, jnp.asarray([[1.5, 1.0]]))
    np.testing.assert_allclose(float(v[0, 0]), 0.5, atol=1e-6)


def test_inverse_warp_identity():
    pc_range = (-6.4, -6.4, -0.8, 6.4, 6.4, 0.8)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32))
    ident = jnp.zeros((16, 16, 7)).at[..., 3].set(1.0)
    warped, valid = inverse_warp(feat, ident, pc_range)
    # identity motion: warp must reproduce the source (interior cells)
    np.testing.assert_allclose(np.asarray(warped)[1:-1, 1:-1],
                               np.asarray(feat)[1:-1, 1:-1], atol=1e-4)
    assert np.asarray(valid).mean() > 0.9


def test_pillar_middle_forward_and_grads(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_model import tiny_cfg, make_example
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.losses.objective import compute_objective

    cfg = tiny_cfg()
    cfg = cfg.replace(middle=dataclasses.replace(
        cfg.middle, name="PillarMiddleCov"))
    example = make_example(rng, cfg)
    net = OdomNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)
    preds = net.apply(variables, example, train=False)
    assert preds["odometry"].shape == (1, 7)
    assert preds["tq_map"].shape == (1, 16, 16, 7)
    cov = np.asarray(preds["voxel_covs"][0])
    m = np.asarray(preds["voxel_masks"][0])
    assert np.all(cov[m][:, :3] > 0)
    assert np.all(np.isfinite(np.asarray(preds["odometry"])))

    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    alphas = {"rot": jnp.float32(-2.5), "trans": jnp.float32(0.0)}

    def loss_fn(p):
        pr, _ = net.apply({"params": p, **other}, example, train=True,
                          mutable=["batch_stats"])
        out = compute_objective(pr, example, alphas, cfg.loss,
                                cfg.voxelizer.point_cloud_range,
                                warmup=True, self_supervised=True)
        return out.total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(float(loss))
    assert np.isfinite(gnorm) and gnorm > 0
