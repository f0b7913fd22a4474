"""Stage-wise profiler for the rulebook geometry build (the indice_key
analog): which of sort / slot-map scatter / downsample dedup / lookup
dominates the ~45 ms/frame build.  Run on the TPU when free.

Usage: python scripts/profile_geometry.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.config.schema import PipelineCfg
from rslo_tpu.data.prepare import prepare_example, voxelizer_config
from rslo_tpu.models.middle import DOWN_SPECS, build_geometry
from rslo_tpu.ops import band_conv as bc
from rslo_tpu.ops import sparse_conv as sc
from rslo_tpu.utils.synthetic import synth_sequence

SHAPE = (41, 768, 1408)


def timeit(name, f, *a, n=3):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:8.2f} ms   (compile {c:.1f}s)",
          flush=True)
    return dt


def main():
    cfg = PipelineCfg()
    caps = cfg.middle.level_capacities
    vcfg = voxelizer_config(cfg)
    frames, _ = synth_sequence(seed=0, n_frames=1,
                               n_points=cfg.data.max_points)
    pts = jnp.asarray(np.stack(frames))
    mask = jnp.ones(pts.shape[:2], bool)
    ex = jax.jit(lambda p, m: prepare_example(p, m, vcfg))(pts, mask)
    coords, vmask = ex["coords"][0], ex["voxel_mask"][0]

    timeit("FULL build_geometry", jax.jit(
        lambda c, m: build_geometry(c, m, SHAPE, caps)), coords, vmask)

    lvl0_f = jax.jit(lambda c, m: sc.with_slot_map(
        sc.level_from_coords(c, m, SHAPE)))
    l0 = lvl0_f(coords, vmask)
    timeit("level_from_coords+slotmap L0", lvl0_f, coords, vmask)
    timeit("level_from_coords only", jax.jit(
        lambda c, m: sc.level_from_coords(c, m, SHAPE)), coords, vmask)

    dn = jax.jit(lambda l: sc.downsample_level(l, *DOWN_SPECS[0],
                                               out_capacity=caps[1]))
    l1 = sc.with_slot_map(dn(l0))
    timeit("downsample L0->L1 (sort dedup)", dn, l0)
    timeit("slot_map L1", jax.jit(sc.with_slot_map), dn(l0))

    sub = jax.jit(sc.build_submanifold_index)
    timeit("subm rulebook L0 (27-tap lookup)", sub, l0)
    timeit("conv index L0->L1", jax.jit(
        lambda a, b: sc.build_conv_index(a, b, *DOWN_SPECS[0])), l0, l1)

    rb = sub(l0)
    timeit("band wrap subm L0 (sel plan)", jax.jit(
        lambda r: bc.build_band_index(r, l0.capacity,
                                      window=bc.SUBM_WINDOW)), rb)
    from rslo_tpu.models.middle import build_band_geometry
    timeit("FULL build_band_geometry", jax.jit(
        lambda c, m: build_band_geometry(c, m, SHAPE, caps)),
        coords, vmask)


if __name__ == "__main__":
    main()
