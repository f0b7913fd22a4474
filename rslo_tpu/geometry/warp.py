"""BEV feature warping by a dense local-transformation map.

JAX port of the reference's ``inverse_warp``
(/root/reference/rslo/utils/geometric.py:310-373): every BEV cell of the
target feature map is sampled at the position its tq-map motion predicts
in the source map (bilinear, zero padding), returning the warped features
and a validity mask.  Used by dynamic-mask / feature-consistency variants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import rotate_vec_by_q
from .tq_map import grid_cell_coords


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """img: (H, W, C); xy: (..., 2) in pixel coords (x along W, y along
    H).  Zero padding outside."""
    H, W, C = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def tap(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        v = img[jnp.clip(yy, 0, H - 1).astype(jnp.int32),
                jnp.clip(xx, 0, W - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((1 - dy) * ((1 - dx) * v00 + dx * v01) +
            dy * ((1 - dx) * v10 + dx * v11))


def inverse_warp(feat_src: jax.Array, tq_map: jax.Array,
                 pc_range) -> tuple[jax.Array, jax.Array]:
    """Warp source BEV features into the target frame.

    feat_src: (H, W, C); tq_map: (H, W, 7) local motion map (channels
    last).  Returns (warped (H, W, C), valid (H, W, 1))."""
    H, W, _ = tq_map.shape
    coords = grid_cell_coords((H, W), pc_range,
                              dtype=jnp.float32)          # (H, W, 3)
    pc = jnp.asarray(pc_range, jnp.float32)
    cell = jnp.array([(pc[3] - pc[0]) / W, (pc[4] - pc[1]) / H])

    t_l = tq_map[..., :3]
    q_l = tq_map[..., 3:]
    # world position each cell maps to under the local motion
    moved = rotate_vec_by_q(coords, q_l) + t_l  # reference semantics:
    # cell's point transformed by the local pose
    # world -> pixel: x right (j), y down == -world y (i)
    jx = (moved[..., 0] - coords[0, 0, 0]) / cell[0]
    iy = (coords[0, 0, 1] - moved[..., 1]) / cell[1]
    xy = jnp.stack([jx, iy], axis=-1)
    warped = bilinear_sample(feat_src, xy)
    valid = ((jx >= 0) & (jx < W) & (iy >= 0) & (iy < H))
    return warped, valid[..., None].astype(feat_src.dtype)
