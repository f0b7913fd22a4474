"""SemiGlobalSyncBN: normalizes with running stats; running stats track
batch moments; dynamic momentum shrinks when stats stabilize."""
import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.models.semiglobal_bn import SemiGlobalSyncBN


def test_running_stat_normalization(rng):
    mod = SemiGlobalSyncBN(momentum=0.5, sync=False)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(4, 8, 8, 4))
                    .astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    # first train step: normalized with the freshly-UPDATED running
    # stats (reference semantics): r_mean = 0.5*2, r_var = 0.5*9+0.5*1
    # -> mean (2-1)/sqrt(5) ~ 0.45
    y, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y).mean(), 1.0 / np.sqrt(5),
                               atol=0.1)
    # running mean moved toward the batch mean
    rm = np.asarray(mut["batch_stats"]["mean"])
    assert np.all(rm > 0.5)
    # repeated steps converge running stats; outputs become normalized
    v2 = {"params": v["params"], **mut}
    for _ in range(30):
        y, mut = mod.apply(v2, x, train=True, mutable=["batch_stats"])
        v2 = {"params": v["params"], **mut}
    ym = float(np.asarray(y).mean())
    ys = float(np.asarray(y).std())
    assert abs(ym) < 0.2 and abs(ys - 1.0) < 0.2, (ym, ys)
    # dynamic momentum decayed below its initial value as stats stabilized
    assert np.all(np.asarray(mut["batch_stats"]["mean_dyn_mom"]) < 0.5)


def test_eval_uses_running_stats(rng):
    mod = SemiGlobalSyncBN(momentum=0.5, sync=False)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    y1 = mod.apply(v, x, train=False)
    y2 = mod.apply(v, x * 100.0, train=False)
    # eval normalization is input-independent (same affine of running)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1) * 100.0,
                               rtol=1e-3, atol=1e-3)


def test_spatial_grouped_instance_norm(rng):
    from rslo_tpu.models.spatial_group_norm import SpatialGroupedInstanceNorm
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(2, 4, 20, 3))
                    .astype(np.float32))
    mod = SpatialGroupedInstanceNorm(num_groups=(1, 5))
    v = mod.init(jax.random.PRNGKey(0), x)
    y = np.asarray(mod.apply(v, x))
    assert y.shape == x.shape
    # each (n, h, group, c) slab of 4 columns is zero-mean ~unit-var
    slabs = y.reshape(2, 4, 5, 4, 3)
    np.testing.assert_allclose(slabs.mean(axis=3), 0.0, atol=1e-4)
    v_med = np.median(slabs.var(axis=3))
    assert abs(v_med - 1.0) < 0.05, v_med
    # uneven split: 20 cols into 3 groups -> 2 std groups of 6 + last 8
    mod2 = SpatialGroupedInstanceNorm(num_groups=(1, 3))
    v2 = mod2.init(jax.random.PRNGKey(0), x)
    y2 = np.asarray(mod2.apply(v2, x))
    assert np.isfinite(y2).all()
