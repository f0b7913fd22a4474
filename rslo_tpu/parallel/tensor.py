"""Tensor (channel/model) parallelism for the dense BEV stage.

Same GSPMD mechanism as spatial.py, different axis: the BEV maps'
CHANNEL dimension is sharded over a mesh axis, so XLA partitions every
conv's filter bank (output channels) across devices and inserts the
all-gathers/reduce-scatters the channel-mixing convs need.  Weights
shard by propagation — no per-layer annotations.  Use case: nets whose
channel widths outgrow one chip's HBM, and latency scaling when the
spatial extent is already cut by SP.

A combined 2-D (space x model) sharding composes both constraints on
the same (..., H, W, C) tensor.  The reference has no analog (its only
axis is DDP data parallelism, /root/reference/train_hdf5.py:594-814);
pipeline parallelism is deliberately absent here — a 2-frame odometry
net's ~11M params do not justify stage latency (PARITY.md) — and there
are no experts to shard (no MoE layers).

Validated against the single-device forward in tests/test_spatial.py.
"""
from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import jax

from .spatial import _active


def make_model_forward(net, mesh: Mesh, axis: str = "model",
                       train: bool = False):
    """jitted (variables, example) -> preds with BEV channels sharded
    over ``mesh[axis]`` (tensor parallelism)."""
    sharding = NamedSharding(mesh, P(None, None, None, axis))

    def fwd(variables, example):
        with _active(sharding):
            return net.apply(variables, example, train=train)

    return jax.jit(fwd)


def make_spatial_model_forward(net, mesh: Mesh, space_axis: str = "space",
                               model_axis: str = "model",
                               train: bool = False):
    """2-D sharding: grid width over ``space_axis`` AND channels over
    ``model_axis`` — SP x TP on one mesh."""
    sharding = NamedSharding(mesh, P(None, None, space_axis, model_axis))

    def fwd(variables, example):
        with _active(sharding):
            return net.apply(variables, example, train=train)

    return jax.jit(fwd)
