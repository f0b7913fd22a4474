"""Per-row-DMA Pallas gather kernels (ops/dma_gather.py) — interpret
mode on CPU; the TPU timing A/B lives in scripts/profile_dma_gather.py."""
import numpy as np
import jax.numpy as jnp
import pytest

from rslo_tpu.ops.dma_gather import dma_gather_matmul, dma_row_gather


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("C", [16, 64])
def test_dma_row_gather_matches_take(rng, C):
    Vin = 300
    feats = jnp.asarray(rng.normal(size=(Vin, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Vin, size=4096).astype(np.int32))
    out = dma_row_gather(feats, idx, block=1024, inflight=8,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(feats)[np.asarray(idx)])


def test_dma_row_gather_bf16(rng):
    Vin, C = 128, 32
    feats = jnp.asarray(
        rng.normal(size=(Vin, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, Vin, size=2048).astype(np.int32))
    out = dma_row_gather(feats, idx, block=512, inflight=16,
                         interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(feats.astype(jnp.float32))[np.asarray(idx)])


def test_dma_gather_matmul_matches_apply(rng):
    """Fused im2col-DMA + matmul == the XLA rulebook conv apply."""
    Vin, Cin, K, Cout, V = 300, 16, 27, 32, 512
    feats = jnp.asarray(rng.normal(size=(Vin, Cin)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Vin, size=(V, K)).astype(np.int32))
    valid = jnp.asarray(rng.random(size=(V, K)) < 0.7)
    w = jnp.asarray(rng.normal(size=(K * Cin, Cout)).astype(np.float32))
    out = dma_gather_matmul(feats, idx, valid, w, block=128, inflight=8,
                            interpret=True)
    g = np.asarray(feats)[np.asarray(idx).reshape(-1)].reshape(V, K, Cin)
    g = np.where(np.asarray(valid)[..., None], g, 0).reshape(V, K * Cin)
    np.testing.assert_allclose(np.asarray(out), g @ np.asarray(w),
                               rtol=1e-5, atol=1e-4)
