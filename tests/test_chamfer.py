"""Chamfer NN search: scan vs brute-force oracle vs Pallas (interpret)."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu.ops.chamfer import nn_search, nn_search_pallas


def brute(src, tgt, tgt_mask):
    d = ((src[:, None, :] - tgt[None]) ** 2).sum(-1)
    d[:, ~tgt_mask] = np.inf
    return d.min(1), d.argmin(1)


def test_nn_search_matches_oracle(rng):
    src = rng.normal(size=(300, 3)).astype(np.float32) * 10
    tgt = rng.normal(size=(500, 3)).astype(np.float32) * 10
    sm = np.ones(300, bool)
    sm[250:] = False
    tm = np.ones(500, bool)
    tm[400:] = False
    d, i = nn_search(jnp.asarray(src), jnp.asarray(sm),
                     jnp.asarray(tgt), jnp.asarray(tm), tile=128)
    d, i = np.asarray(d), np.asarray(i)
    od, oi = brute(src, tgt, tm)
    np.testing.assert_array_equal(i[sm], oi[sm])
    np.testing.assert_allclose(d[sm], od[sm], rtol=1e-3, atol=1e-3)
    assert np.all(d[~sm] >= 1e29)


def test_pallas_kernel_interpret_matches_scan(rng):
    """Run the TPU kernel in interpreter mode on CPU and compare."""
    N = 256
    src = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 5)
    tgt = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 5)
    sm = jnp.ones((N,), bool).at[-13:].set(False)
    tm = jnp.ones((N,), bool).at[-7:].set(False)
    d1, i1 = nn_search(src, sm, tgt, tm, tile=128)
    d2, i2 = nn_search_pallas(src, sm, tgt, tm, src_tile=64,
                              tgt_tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1)[np.asarray(sm)],
                               np.asarray(d2)[np.asarray(sm)],
                               rtol=1e-4, atol=1e-4)
