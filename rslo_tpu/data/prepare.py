"""Device-side example preparation: padded raw point clouds -> voxelized
model inputs.  Runs inside the same jit as the train/eval step — the
point->voxel scatter is TPU work, not host preprocessing (unlike the
reference, which voxelizes in C++ dataloader workers,
/root/reference/rslo/data/preprocess.py:469-512)."""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config.schema import PipelineCfg, grid_size
from ..ops.voxelize import VoxelizerConfig, voxelize


def voxelizer_config(cfg: PipelineCfg) -> VoxelizerConfig:
    v = cfg.voxelizer
    return VoxelizerConfig(
        point_cloud_range=tuple(v.point_cloud_range),
        voxel_size=tuple(v.voxel_size),
        max_points=v.max_points_per_voxel,
        max_voxels=v.max_voxels,
        height_threshold=v.height_threshold,
        block_size=v.block_size,
    )


def prepare_example(points: jax.Array, point_mask: jax.Array,
                    vcfg: VoxelizerConfig) -> Dict[str, jax.Array]:
    """points: (L, N, F) padded frames; point_mask: (L, N) bool.
    Returns the voxelized example consumed by OdomNet (no batch dim)."""
    L = points.shape[0]
    vox = [voxelize(points[t], point_mask[t], vcfg) for t in range(L)]
    return {
        "voxels": jnp.stack([v.voxels for v in vox]),
        "num_points": jnp.stack([v.num_points for v in vox]),
        "coords": jnp.stack([v.coords for v in vox]),
        "voxel_mask": jnp.stack([v.mask for v in vox]),
    }
