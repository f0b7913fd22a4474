"""Pallas per-row-DMA gather for the sparse-conv engines.

The rulebook engine's hot op is `features[idx]` — ~1.1M random row
fetches of 32-256 B each per L0 conv.  XLA lowers this one-big-gather
to ~2 GB/s effective on v5e (~400x off the 820 GB/s HBM roofline,
BENCH_NOTES "Known cost drivers" #2), and this jax/Mosaic version
rejects in-kernel vector gathers (`jnp.take` fails to lower), so the
remaining formulation is an explicit per-row DMA pipeline: each grid
block reads its slice of `idx` from SMEM, issues one async HBM->VMEM
copy per row with a ring of in-flight DMAs, and lets the grid overlap
blocks.  This was the honest test of whether the gather bound is XLA's
lowering or the hardware's per-transaction latency (VERDICT r4 next
#4a).  MEASURED (r5, v5e, BENCH_NOTES "per-row-DMA gather measured"):
(a) this Mosaic toolchain crashes on >1 dynamic-index row DMA with
rows narrower than 128 lanes (minimal repro in BENCH_NOTES), so the
engine's real C=16..64 widths cannot compile; (b) at C=128 where it
does compile, the pipeline is descriptor-rate-bound at ~26 ns/row —
2.7x SLOWER than XLA's gather (19.4 vs 51.5 GB/s), insensitive to
block/inflight depth.  XLA's one-big-row-gather IS the fast path for
random row access on this hardware; these kernels remain as the
evidence and for retesting on future toolchains.

Reference analog: spconv's gather/scatter CUDA kernels
(/root/reference/thirdparty/spconv — external .cu, see SURVEY.md §2.8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, feat_ref, out_ref, sems, *, block: int,
                   inflight: int):
    def get_dma(r):
        return pltpu.make_async_copy(
            feat_ref.at[idx_ref[r]],
            out_ref.at[r],
            sems.at[r % inflight])

    def body(r, carry):
        @pl.when(r >= inflight)
        def _():
            get_dma(r - inflight).wait()
        get_dma(r).start()
        return carry

    jax.lax.fori_loop(0, block, body, 0)

    def tail(r, carry):
        get_dma(r).wait()
        return carry

    jax.lax.fori_loop(max(block - inflight, 0), block, tail, 0)


@functools.partial(jax.jit,
                   static_argnames=("block", "inflight", "interpret"))
def dma_row_gather(features: jax.Array, idx: jax.Array, *,
                   block: int = 2048, inflight: int = 16,
                   interpret: bool = False) -> jax.Array:
    """``features[idx]`` via a pipelined per-row DMA Pallas kernel.

    features: (Vin, C) — stays in HBM, rows are DMA'd on demand.
    idx: (N,) int32 row indices in [0, Vin).  N must be a multiple of
    ``block`` (pad with any valid index and mask after, as the
    rulebook path already does for invalid taps).
    """
    N = idx.shape[0]
    Vin, C = features.shape
    assert N % block == 0, (N, block)
    grid = (N // block,)
    return pl.pallas_call(
        functools.partial(_gather_kernel, block=block, inflight=inflight),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), features.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, features)


def _gather_matmul_kernel(idx_ref, valid_ref, feat_ref, w_ref, out_ref,
                          gbuf, sems, *, block: int, K: int,
                          inflight: int):
    """Fused gather + (block, K*Cin) @ (K*Cin, Cout) matmul: DMA the
    K tap rows of each output row into a VMEM im2col buffer, zero
    invalid taps, one MXU matmul per block."""
    n = block * K

    def get_dma(r):
        return pltpu.make_async_copy(
            feat_ref.at[idx_ref[r]],
            gbuf.at[r // K, r % K],
            sems.at[r % inflight])

    def body(r, carry):
        @pl.when(r >= inflight)
        def _():
            get_dma(r - inflight).wait()
        get_dma(r).start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    def tail(r, carry):
        get_dma(r).wait()
        return carry

    jax.lax.fori_loop(max(n - inflight, 0), n, tail, 0)

    Cin = feat_ref.shape[1]
    valid = valid_ref[:].reshape(block, K, 1)
    g = jnp.where(valid, gbuf[:], 0).reshape(block, K * Cin)
    out_ref[:] = jnp.dot(g, w_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block", "inflight", "interpret"))
def dma_gather_matmul(features: jax.Array, idx: jax.Array,
                      valid: jax.Array, weights: jax.Array, *,
                      block: int = 256, inflight: int = 16,
                      interpret: bool = False) -> jax.Array:
    """Fused sparse-conv apply: im2col via per-row DMA + MXU matmul.

    features: (Vin, Cin); idx/valid: (V, K); weights: (K*Cin, Cout).
    V must be a multiple of ``block``.  Returns (V, Cout) float32.
    """
    V, K = idx.shape
    Vin, Cin = features.shape
    Cout = weights.shape[-1]
    assert V % block == 0, (V, block)
    grid = (V // block,)
    return pl.pallas_call(
        functools.partial(_gather_matmul_kernel, block=block, K=K,
                          inflight=inflight),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block * K,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, K, Cin), features.dtype),
            pltpu.SemaphoreType.DMA((inflight,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx.reshape(-1), valid, features, weights)
