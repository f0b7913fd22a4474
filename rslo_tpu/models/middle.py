"""Sparse 3D middle feature extractor + per-voxel covariance decoder.

TPU-native re-design of the reference's SpMiddleFHDWithCov2_3
(/root/reference/rslo/models/middle.py:36-245): the same channel plan
(16-16 @ full res → 32-32 @ 1/2 → 64s @ 1/4, 1/8 → z-collapse → dense
BEV at 1/8 with C*D=128 channels) plus an inverse-conv decoder from the
1/4-res level back to full resolution emitting 7 covariance parameters
per active voxel (cumulative eigenvalues through elu+1 + eigvec
quaternion), but implemented on the sorted-level/rulebook engine in
:mod:`rslo_tpu.ops.sparse_conv` rather than gather-scatter CUDA.

Geometry (levels + rulebooks) is built once per frame and shared by all
layers at the same resolution — the analog of spconv's ``indice_key``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import MiddleCfg
from ..utils.mesh_axis import axis_present
from ..ops import sparse_conv as sc


class FrameGeometry(NamedTuple):
    """Per-frame sparse geometry shared across layers (indice_key analog)."""
    levels: tuple          # L0 (full res) .. L4 (z-collapsed)
    sub_rb: tuple          # submanifold rulebooks for L0..L3
    down_rb: tuple         # strided-conv rulebooks L0->L1, L1->L2, L2->L3, L3->L4
    inv_rb: tuple          # inverse rulebooks L2->L1, L1->L0


DOWN_SPECS = (
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # L0 -> L1
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # L1 -> L2
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),   # L2 -> L3 (z unpadded)
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),   # L3 -> L4 (z collapse)
)


def build_geometry(coords: jax.Array, mask: jax.Array, sparse_shape,
                   capacities) -> FrameGeometry:
    """coords: (V, 3) zyx int32; sparse_shape: (nz, ny, nx) with the
    reference's +1 on z already applied; capacities: per-level static caps
    (L4 reuses the L3 capacity)."""
    l0 = sc.with_slot_map(sc.level_from_coords(coords, mask, sparse_shape))
    levels = [l0]
    down_rb = []
    caps = list(capacities) + [capacities[-1]]
    for i, (k, s, p) in enumerate(DOWN_SPECS):
        nxt = sc.downsample_level(levels[-1], k, s, p,
                                  out_capacity=caps[min(i + 1, len(caps) - 1)])
        if i < len(DOWN_SPECS) - 1:  # L4 is never looked up in
            nxt = sc.with_slot_map(nxt)
        down_rb.append(sc.build_conv_index(levels[-1], nxt, k, s, p))
        levels.append(nxt)
    sub_rb = tuple(sc.build_submanifold_index(l) for l in levels[:4])
    inv_rb = (
        sc.build_inverse_index(levels[2], levels[1], *DOWN_SPECS[1]),
        sc.build_inverse_index(levels[1], levels[0], *DOWN_SPECS[0]),
    )
    return FrameGeometry(tuple(levels), sub_rb, tuple(down_rb), inv_rb)


class SpConv(nn.Module):
    """One sparse conv layer: rulebook-driven gather-matmul + bias."""
    features: int
    taps: int  # kernel volume

    @nn.compact
    def __call__(self, feats, rulebook, out_mask):
        cin = feats.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.taps, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return sc.sparse_conv_apply(feats, rulebook, w, b, out_mask)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxel rows of a (V, C) feature array, with
    running stats and optional cross-replica sync (axis_name="data")."""
    sync: bool = False
    momentum: float = 0.99
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if train:
            m = mask[:, None].astype(jnp.float32)
            n = jnp.sum(m) + 1e-6
            s1 = jnp.sum(x * m, axis=0)
            s2 = jnp.sum(x * x * m, axis=0)
            if self.sync and axis_present("data"):
                n = jax.lax.psum(n, "data")
                s1 = jax.lax.psum(s1, "data")
                s2 = jax.lax.psum(s2, "data")
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[:, None], y, 0.0)


class SparseMiddleCov(nn.Module):
    """Sparse middle net with BEV output + full-res covariance decoder."""
    cfg: MiddleCfg

    def _norm(self, x, mask, train):
        if self.cfg.bn_type == "none":
            return x
        return MaskedBatchNorm(sync=self.cfg.bn_type == "sync_bn")(
            x, mask, train)

    @nn.compact
    def __call__(self, voxel_features: jax.Array, geo: FrameGeometry,
                 train: bool):
        """voxel_features: (V0, F) encoded per-voxel features aligned with
        geo.levels[0].  Returns (bev (H, W, C*D), cov_params (V0, 7))."""
        c0, c1, c2, c3 = self.cfg.channels
        L = geo.levels
        relu = nn.relu

        def block(x, lvl_i, feats, n_layers, train):
            for _ in range(n_layers):
                x = SpConv(feats, 27)(x, geo.sub_rb[lvl_i], L[lvl_i].mask)
                x = self._norm(x, L[lvl_i].mask, train)
                x = relu(x)
            return x

        # encoder (middle_conv): L0 subm x2 -> down -> L1 subm x2 -> down
        x = block(voxel_features, 0, c0, 2, train)
        x = SpConv(c1, 27)(x, geo.down_rb[0], L[1].mask)
        x = relu(self._norm(x, L[1].mask, train))
        x = block(x, 1, c1, 2, train)
        x = SpConv(c2, 27)(x, geo.down_rb[1], L[2].mask)
        x = relu(self._norm(x, L[2].mask, train))
        x_mid = x  # L2 features feed the covariance decoder

        # tail: L2 subm x3 -> down -> L3 subm x3 -> z-collapse to L4
        x = block(x, 2, c2, 3, train)
        x = SpConv(c3, 27)(x, geo.down_rb[2], L[3].mask)
        x = relu(self._norm(x, L[3].mask, train))
        x = block(x, 3, c3, 3, train)
        x = SpConv(c3, 3)(x, geo.down_rb[3], L[4].mask)
        x = relu(self._norm(x, L[4].mask, train))

        # dense BEV: (nz, ny, nx, C) -> (ny, nx, nz*C)
        dense = sc.to_dense(x, L[4])
        nz, ny, nx, C = dense.shape
        bev = jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, nz * C)

        # covariance decoder: inverse convs back to full res (always BN,
        # mirroring the reference's plain BatchNorm1d in the decoder)
        bn = lambda: MaskedBatchNorm(sync=False)
        y = SpConv(c1, 27)(x_mid, geo.inv_rb[0], L[1].mask)
        y = relu(bn()(y, L[1].mask, train))
        y = SpConv(c1, 27)(y, geo.sub_rb[1], L[1].mask)
        y = relu(bn()(y, L[1].mask, train))
        y = SpConv(c0, 27)(y, geo.inv_rb[1], L[0].mask)
        y = relu(bn()(y, L[0].mask, train))
        y = SpConv(c0, 27)(y, geo.sub_rb[0], L[0].mask)
        y = relu(bn()(y, L[0].mask, train))
        y = SpConv(c0, 27)(y, geo.sub_rb[0], L[0].mask)
        y = relu(bn()(y, L[0].mask, train))
        cov = SpConv(self.cfg.cov_channels, 27)(y, geo.sub_rb[0], L[0].mask)
        cov = jnp.concatenate(
            [nn.elu(cov[:, :3]) + 1 + 1e-6, cov[:, 3:]], axis=-1)
        cov = jnp.where(L[0].mask[:, None], cov, 0.0)
        return bev, cov
