"""One-direction nearest-neighbor search (chamfer association).

TPU-native replacement for the reference's CUDA brute-force kernel
(/root/reference/thirdparty/chamfer_distance/chamfer_distance.cu): for each
source point, the squared distance to — and index of — its nearest target
point.  Two implementations with one API:

  * ``nn_search`` — XLA: lax.scan over target tiles, distances via one
    (N, 3) x (3, T) matmul per tile, running min/argmin.  Works on CPU
    and TPU; this is the default and the autodiff path.
  * ``nn_search_pallas`` — Pallas TPU kernel, tiled over both point sets
    with the argmin accumulated in VMEM across the target-tile grid axis.

The argmin is piecewise constant, so no gradient flows through the search
itself (the caller recomputes differentiable quantities from the returned
indices — same structure as the reference loss).  Returned distances are
wrapped in stop_gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e30  # python float: jnp scalars would be captured as consts
            # inside pallas kernels


@functools.partial(jax.jit, static_argnames=("tile",))
def nn_search(src: jax.Array, src_mask: jax.Array, tgt: jax.Array,
              tgt_mask: jax.Array, tile: int = 512):
    """For each src point, nearest tgt point.

    Args:
      src: (N, 3); src_mask: (N,) bool; tgt: (M, 3); tgt_mask: (M,) bool.
      tile: target tile length for the scan.

    Returns:
      dist: (N,) squared distance (stop-gradient; BIG where src invalid
        or no valid target exists).
      idx: (N,) int32 index into tgt (0 where invalid).
    """
    N = src.shape[0]
    M = tgt.shape[0]
    pad = (-M) % tile
    if pad:
        tgt = jnp.concatenate([tgt, jnp.zeros((pad, 3), tgt.dtype)])
        tgt_mask = jnp.concatenate([tgt_mask, jnp.zeros((pad,), bool)])
    Mp = tgt.shape[0]

    src = jax.lax.stop_gradient(src.astype(jnp.float32))
    tgt = jax.lax.stop_gradient(tgt.astype(jnp.float32))
    src_sq = jnp.sum(src * src, axis=-1)  # (N,)

    tgt_tiles = tgt.reshape(Mp // tile, tile, 3)
    mask_tiles = tgt_mask.reshape(Mp // tile, tile)

    def body(carry, inp):
        best_d, best_i = carry
        t, m, base = inp
        # (N, T) squared distances via the MXU cross term.  precision
        # HIGHEST is load-bearing: the TPU default runs bf16 passes,
        # which at |x|~30 m coordinates injects O(10) m^2 distance
        # error and corrupts ~10-30% of the associations (measured on
        # v5e vs the exact-fp32 Pallas kernel / numpy argmin).
        cross = jnp.dot(src, t.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d = src_sq[:, None] - 2.0 * cross + jnp.sum(t * t, axis=-1)[None, :]
        d = jnp.where(m[None, :], d, BIG)
        ti = jnp.argmin(d, axis=-1)
        td = jnp.take_along_axis(d, ti[:, None], axis=-1)[:, 0]
        upd = td < best_d
        best_i = jnp.where(upd, base + ti.astype(jnp.int32), best_i)
        best_d = jnp.where(upd, td, best_d)
        return (best_d, best_i), None

    init = (jnp.full((N,), BIG, jnp.float32), jnp.zeros((N,), jnp.int32))
    bases = jnp.arange(Mp // tile, dtype=jnp.int32) * tile
    (dist, idx), _ = jax.lax.scan(body, init,
                                  (tgt_tiles, mask_tiles, bases))
    dist = jnp.where(src_mask, dist, BIG)
    idx = jnp.where(src_mask, idx, 0)
    return jnp.maximum(dist, 0.0), idx


def nn_search_auto(src, src_mask, tgt, tgt_mask, src_tile: int = 1024,
                   tgt_tile: int = 512):
    """Pallas kernel on TPU when shapes tile-align, XLA scan otherwise.
    Default tiles keep the (src_tile, tgt_tile) f32 distance block at
    2 MB so the kernel's working set stays well inside VMEM.

    src_tile must stay a multiple of 1024: it is the block size of the
    kernel's 1-D outputs, and XLA lays 1-D f32/s32 buffers out as
    T(1024) — Mosaic rejects sub-1024 blocks with a layout mismatch
    (measured on v5e; the sweep harness hit it at 512).  tgt_tile is
    free in multiples of 128 (the tgt operand is 2-D)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if (on_tpu and src.shape[0] % src_tile == 0 and
            tgt.shape[0] % tgt_tile == 0):
        return nn_search_pallas(src, src_mask, tgt, tgt_mask,
                                src_tile=src_tile, tgt_tile=tgt_tile)
    return nn_search(src, src_mask, tgt, tgt_mask)


def nn_search_pallas(src: jax.Array, src_mask: jax.Array, tgt: jax.Array,
                     tgt_mask: jax.Array, *, src_tile: int = 1024,
                     tgt_tile: int = 512, interpret: bool = False):
    """Pallas TPU version of :func:`nn_search` (same contract).

    Grid is (src tiles, tgt tiles); the output block for a src tile is
    revisited across the tgt axis, carrying the running min/argmin.
    Shapes must be multiples of the tile sizes (pad upstream).

    Layout/compute choices (pallas_guide): distances are pure VPU
    broadcast work — src coords come in rows-major ((TN, 1) columns
    across sublanes), tgt coords TRANSPOSED once outside the kernel to
    a (4, M) matrix whose rows are (x, y, z, mask-penalty): per
    coordinate a broadcast-subtract-square-accumulate builds (TN, TT)
    without any in-kernel transpose or K=3 MXU matmul, and adding the
    penalty row (0 valid / BIG invalid) reproduces the masked-distance
    semantics with NO integer mask operands — 1-D s32 *inputs* trip
    Mosaic's XLA-layout rule (input layout T(1024) vs Mosaic T(512))
    at sub-1024 tile sizes; Mosaic-owned 1-D outputs are fine.
    src_mask is only applied outside the kernel.  The per-tile argmin
    is a lane min-reduce plus a first-match iota min-reduce (no argmin
    primitive)."""
    from jax.experimental import pallas as pl

    N, M = src.shape[0], tgt.shape[0]
    assert N % src_tile == 0 and M % tgt_tile == 0, (N, M)
    src = jax.lax.stop_gradient(src.astype(jnp.float32))
    tgtT = jnp.concatenate(
        [jax.lax.stop_gradient(tgt.astype(jnp.float32)).T,
         jnp.where(tgt_mask, 0.0, BIG).astype(jnp.float32)[None, :]],
        axis=0)                                             # (4, M)

    def kernel(s_ref, tT_ref, d_ref, i_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            d_ref[:] = jnp.full_like(d_ref, BIG)
            i_ref[:] = jnp.zeros_like(i_ref)

        dx = s_ref[:, 0][:, None] - tT_ref[0, :][None, :]   # (TN, TT)
        dy = s_ref[:, 1][:, None] - tT_ref[1, :][None, :]
        dz = s_ref[:, 2][:, None] - tT_ref[2, :][None, :]
        d = dx * dx + dy * dy + dz * dz + tT_ref[3, :][None, :]
        td = jnp.min(d, axis=-1)                            # (TN,)
        jidx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        ti = jnp.min(jnp.where(d <= td[:, None], jidx, M), axis=-1)
        upd = td < d_ref[:]
        base = j * tgt_tile
        i_ref[:] = jnp.where(upd, base + ti, i_ref[:])
        d_ref[:] = jnp.where(upd, td, d_ref[:])

    grid = (N // src_tile, M // tgt_tile)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_tile, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((4, tgt_tile), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((src_tile,), lambda i, j: (i,)),
            pl.BlockSpec((src_tile,), lambda i, j: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ],
        interpret=interpret,
    )(src, tgtT)
    dist = jnp.where(src_mask, dist, BIG)
    idx = jnp.where(src_mask, idx, 0)
    return jnp.maximum(dist, 0.0), idx
