"""Dense masked Conv3D middle: block semantics vs numpy oracles +
end-to-end forward/grads."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rslo_tpu.config.schema import MiddleCfg
from rslo_tpu.models.middle_dense import (DenseConv, DenseConvTranspose,
                                          DenseMiddleCov, _occupancy_down)


def test_dense_conv_submanifold_semantics(rng):
    """conv(x)*occ == the sparse submanifold rule (inactive sites read 0
    and write 0)."""
    x = np.zeros((1, 4, 5, 6, 3), np.float32)
    occ = np.zeros((1, 4, 5, 6, 1), np.float32)
    act = rng.random((4, 5, 6)) < 0.3
    x[0, act] = rng.normal(size=(act.sum(), 3))
    occ[0, act] = 1.0
    mod = DenseConv(2)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.bfloat16),
                 jnp.asarray(occ))
    y = np.asarray(mod.apply(v, jnp.asarray(x, jnp.bfloat16),
                             jnp.asarray(occ))).astype(np.float32)
    w = np.asarray(v["params"]["kernel"], np.float32)
    b = np.asarray(v["params"]["bias"], np.float32)
    # oracle
    want = np.zeros((4, 5, 6, 2), np.float32)
    for z in range(4):
        for yy in range(5):
            for xx in range(6):
                if not act[z, yy, xx]:
                    continue
                acc = b.copy()
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            iz, iy, ix = z + dz - 1, yy + dy - 1, xx + dx - 1
                            if 0 <= iz < 4 and 0 <= iy < 5 and 0 <= ix < 6:
                                acc = acc + x[0, iz, iy, ix] @ w[dz, dy, dx]
                want[z, yy, xx] = acc
    np.testing.assert_allclose(y[0], want, atol=0.05)  # bf16 compute
    assert np.all(y[0][~act] == 0)


def test_occupancy_down_matches_window_or():
    occ = np.zeros((1, 5, 6, 7, 1), np.float32)
    occ[0, 2, 3, 4, 0] = 1.0
    out = np.asarray(_occupancy_down(jnp.asarray(occ), (3, 3, 3),
                                     (2, 2, 2), ((1, 1), (1, 1), (1, 1))))
    # the active input at (2,3,4) covers outputs o with 2o-1<=i<=2o+1
    want_active = {(z, y, x) for z in (1,) for y in (1, 2) for x in (2,)}
    got = {tuple(i) for i in np.argwhere(out[0, ..., 0] > 0)}
    assert got == want_active


def test_dense_conv_transpose_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 5, 6)).astype(np.float32),
                    jnp.bfloat16)
    occ_fine = jnp.ones((1, 5, 8, 10, 1), jnp.float32)
    mod = DenseConvTranspose(4, out_shape=(5, 8, 10))
    v = mod.init(jax.random.PRNGKey(0), x, occ_fine)
    y = mod.apply(v, x, occ_fine)
    assert y.shape == (1, 5, 8, 10, 4)
    assert np.all(np.isfinite(np.asarray(y, np.float32)))


@pytest.mark.slow
def test_dense_middle_cov_forward_and_grads(rng):
    cfg = MiddleCfg(channels=(4, 4, 8, 8))
    shape = (9, 32, 32)   # nz(+1), ny, nx — z ladder 8->... use 41-style
    # need a z ladder that survives 4 downsamples: nz=41-style minimal=41
    shape = (41, 16, 16)
    mod = DenseMiddleCov(cfg, shape)
    V = 128
    coords = np.stack([rng.integers(0, 40, V), rng.integers(0, 16, V),
                       rng.integers(0, 16, V)], -1).astype(np.int32)
    vmask = np.ones(V, bool)
    vmask[100:] = False
    feats = rng.normal(size=(V, 7)).astype(np.float32)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                 jnp.asarray(coords), jnp.asarray(vmask), False)

    def loss(params):
        bev, cov = mod.apply({"params": params["params"],
                              **{k: v2 for k, v2 in v.items()
                                 if k != "params"}},
                             jnp.asarray(feats), jnp.asarray(coords),
                             jnp.asarray(vmask), True,
                             mutable=["batch_stats"])[0]
        return jnp.sum(bev ** 2) + jnp.sum(cov ** 2)

    l, g = jax.value_and_grad(lambda p: loss({"params": p}))(v["params"])
    assert np.isfinite(float(l))
    gn = float(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0
    bev, cov = mod.apply(v, jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(vmask), False)
    assert bev.shape == (2, 2, 16)   # ny/8, nx/8, 2*c3
    assert cov.shape == (V, 7)
    assert np.all(np.asarray(cov)[~vmask] == 0)
