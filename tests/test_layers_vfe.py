"""Small layers + extra VFE variants."""
import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.models.layers import (Dropout2dGivenMask, elu_plus,
                                    mask_propagate, trunc_exp)
from rslo_tpu.models.vfe import (simple_voxel_radius,
                                 simple_voxel_xyzi_normal_gt)


def test_elu_plus_positive(rng):
    x = jnp.asarray(rng.normal(size=(32,)) * 5)
    assert np.all(np.asarray(elu_plus(x)) > 0)


def test_trunc_exp_bounded():
    assert np.isfinite(float(trunc_exp(jnp.asarray(1000.0))))


def test_dropout_given_mask_replays(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    mod = Dropout2dGivenMask(rate=0.5)
    v = mod.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x,
                 deterministic=False)
    y1, m = mod.apply(v, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    y2, m2 = mod.apply(v, x, mask=m, deterministic=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2))


def test_vfe_radius(rng):
    vox = jnp.asarray(rng.normal(size=(8, 4, 4)).astype(np.float32))
    num = jnp.full((8,), 4, jnp.int32)
    out = np.asarray(simple_voxel_radius(vox, num, 4))
    m = np.asarray(vox).mean(axis=1)
    np.testing.assert_allclose(out[:, 0],
                               np.linalg.norm(m[:, :2], axis=1), atol=1e-4)


def test_vfe_normal_gt(rng):
    vox = jnp.asarray(rng.normal(size=(8, 4, 10)).astype(np.float32))
    num = jnp.full((8,), 4, jnp.int32)
    feats, gt = simple_voxel_xyzi_normal_gt(vox, num, 10)
    assert feats.shape == (8, 7)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(gt), axis=1),
                               1.0, atol=1e-4)


def test_mask_propagate_stride():
    m = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(1.0)
    out = np.asarray(mask_propagate(m, 3, 2))
    assert out.shape == (1, 4, 4, 1)
    assert out[0, 1, 1, 0] == 1.0


def test_learned_vfe_forward(rng):
    import jax
    from rslo_tpu.models.vfe_learned import LearnedVFE
    vox = jnp.asarray(rng.normal(size=(16, 5, 7)).astype(np.float32))
    num = jnp.asarray(rng.integers(0, 6, size=(16,)).astype(np.int32))
    mod = LearnedVFE(num_filters=(8, 16))
    v = mod.init(jax.random.PRNGKey(0), vox, num)
    out = np.asarray(mod.apply(v, vox, num))
    assert out.shape == (16, 16)
    # empty voxels produce zeros
    empty = np.asarray(num) == 0
    assert np.all(out[empty] == 0)
    assert np.all(np.isfinite(out))


def test_vfe_normalize_variant(rng):
    from rslo_tpu.models.vfe import simple_voxel_xyzi_normal_normalize
    v = rng.normal(size=(8, 4, 7)).astype(np.float32)
    n = rng.integers(1, 5, size=(8,))
    for i in range(8):            # voxelizer invariant: padding is zero
        v[i, n[i]:] = 0.0
    out = np.asarray(simple_voxel_xyzi_normal_normalize(
        jnp.asarray(v), jnp.asarray(n)))
    assert out.shape == (8, 7)
    # intensity zeroed, normals unit
    np.testing.assert_allclose(out[:, 3], 0.0)
    np.testing.assert_allclose(np.linalg.norm(out[:, 4:7], axis=1), 1.0,
                               atol=1e-4)
    # xyz scaled by range maxima
    mean = np.stack([v[i, :n[i], :3].mean(0) for i in range(8)])
    np.testing.assert_allclose(
        out[:, :3], mean / np.array([70.4, 38.4, 5.0]), atol=1e-4)


def test_vfe_bound_variant(rng):
    from rslo_tpu.models.vfe import simple_voxel_bound_xyzi_normal
    v = rng.normal(size=(8, 4, 7)).astype(np.float32)
    n = rng.integers(1, 5, size=(8,))
    for i in range(8):            # voxelizer invariant: padding is zero
        v[i, n[i]:] = 0.0
    out = np.asarray(simple_voxel_bound_xyzi_normal(
        jnp.asarray(v), jnp.asarray(n)))
    assert out.shape == (8, 7)
    for i in range(8):
        r = np.linalg.norm(v[i, :n[i], :3], axis=1)
        k = int(np.argmin(r))
        np.testing.assert_allclose(out[i, :4], v[i, k, :4], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[:, 4:7], axis=1), 1.0,
                               atol=1e-4)
