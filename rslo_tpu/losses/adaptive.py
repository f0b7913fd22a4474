"""Adaptive (homoscedastic-uncertainty) weighted L2 losses.

Pure-JAX ports of the reference's semantics
(/root/reference/rslo/core/losses.py:144-277): per-sample masked mean of
squared error, focal re-weighting ``(e^{-a} l)^g / sum``, and the learned
log-variance term ``e^{-a} l + a``.  The learnable alphas live in the
train state (see :mod:`rslo_tpu.losses.modules`); these functions are
stateless.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import quat_to_matrix


def _per_sample_mean(sq: jax.Array, mask: jax.Array | None) -> jax.Array:
    """(B, ...) squared errors -> (B,) masked means."""
    axes = tuple(range(1, sq.ndim))
    if mask is None:
        return jnp.mean(sq, axis=axes)
    mask = jnp.broadcast_to(mask, sq.shape)
    return (jnp.sum(sq * mask, axis=axes) /
            (jnp.sum(mask, axis=axes) + 1e-12))


def adaptive_weighted_l2(pred: jax.Array, target: jax.Array,
                         alpha: jax.Array, mask: jax.Array | None = None,
                         focal_gamma: float = 0.0,
                         weight: float = 1.0) -> jax.Array:
    """AdaptiveWeightedL2Loss.  pred/target: (B, ...); alpha: scalar."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = pred - target
    loss_b = _per_sample_mean(diff * diff, mask)        # (B,)
    scaled = jnp.exp(-alpha) * loss_b
    focal_w = scaled ** focal_gamma
    focal_w = focal_w / (jnp.sum(focal_w) + 1e-12)
    return weight * (jnp.sum(focal_w * scaled) + alpha)


def adaptive_weighted_l2_rmatrix(pred_q: jax.Array, target_q: jax.Array,
                                 alpha: jax.Array,
                                 mask: jax.Array | None = None,
                                 focal_gamma: float = 0.0,
                                 weight: float = 1.0) -> jax.Array:
    """Rotation variant on the R_pred^T R_tgt - I residual
    (losses.py:200-277).  Inputs are quaternions (..., 4) wxyz (or
    9-vectors treated as row-major matrices)."""
    def to_mat(x):
        if x.shape[-1] == 4:
            return quat_to_matrix(x)
        return x.reshape(x.shape[:-1] + (3, 3))
    P = to_mat(pred_q.astype(jnp.float32))
    T = to_mat(target_q.astype(jnp.float32))
    diff = jnp.matmul(jnp.swapaxes(P, -1, -2), T,
                      precision=jax.lax.Precision.HIGHEST) - jnp.eye(3)
    sq = diff * diff
    if mask is not None:
        mask = jnp.broadcast_to(mask[..., None, None], sq.shape)
    loss_b = _per_sample_mean(sq.reshape(sq.shape[0], -1),
                              None if mask is None else
                              mask.reshape(sq.shape[0], -1))
    scaled = jnp.exp(-alpha) * loss_b
    focal_w = scaled ** focal_gamma
    focal_w = focal_w / (jnp.sum(focal_w) + 1e-12)
    return weight * (jnp.sum(focal_w * scaled) + alpha)


def l2_loss(pred: jax.Array, target: jax.Array,
            mask: jax.Array | None = None, weight: float = 1.0) -> jax.Array:
    diff = (pred - target).astype(jnp.float32)
    sq = diff * diff
    if mask is None:
        return weight * jnp.mean(sq)
    mask = jnp.broadcast_to(mask, sq.shape)
    return weight * jnp.sum(sq * mask) / (jnp.sum(mask) + 1e-12)
