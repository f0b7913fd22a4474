"""Stage breakdown of the band-engine sparse path: is the 218 ms
two-frame forward dominated by the per-frame PLAN BUILD (sorted-level
geometry + band index construction) or by the conv compute?

The answer picks round 3's lever:
  - plan build dominates -> incremental/reused plans across frames or a
    Pallas bucket/radix build (the voxel set changes slowly frame to
    frame in odometry streaming);
  - conv compute dominates -> widen the Pallas kernel's win at C>=64
    levels / fuse the cov-decoder taps.

Times three jitted graphs with honest host-fetch sync:
  A. voxelize (sorted-mean) per frame
  B. build_band_geometry per frame  (plans for all levels)
  C. all band convs on FIXED geometry (the middle net minus plan build)

Usage: python -u scripts/profile_band_stages.py [reps]
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
from rslo_tpu.models.middle import build_band_geometry
from rslo_tpu.utils.synthetic import synth_sequence


def timeit(name, f, *a, n=5):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import dataclasses
    cfg = PipelineCfg()
    cfg = cfg.replace(middle=dataclasses.replace(
        cfg.middle, name="SparseMiddleCov", engine="band"))
    vcfg = voxelizer_config(cfg)
    grid = vcfg.grid_size
    caps = cfg.middle.level_capacities

    frames, _ = synth_sequence(seed=0, n_frames=1,
                               n_points=cfg.data.max_points)
    pts = jnp.asarray(frames[0][None])
    msk = jnp.ones((1, pts.shape[1]), bool)

    vox = jax.jit(lambda p, m: prepare_example(p, m, vcfg,
                                               mean_mode=True))
    timeit("A voxelize+meanVFE (1 frame)", vox, pts, msk, n=reps)

    ex = vox(pts, msk)
    coords, vmask = ex["coords"][0], ex["voxel_mask"][0]
    feats = ex["voxel_features"][0]

    geo_fn = jax.jit(lambda c, m: build_band_geometry(c, m, grid, caps))
    timeit("B band plan build (1 frame, all levels)", geo_fn,
           coords, vmask, n=reps)

    # C: the middle net's conv stack on fixed plans.  Closure over the
    # geometry pytree keeps it a jit constant (same as a cached plan).
    geo = jax.tree.map(jax.device_put, geo_fn(coords, vmask))
    from rslo_tpu.models.middle import SparseMiddleCov
    mid = SparseMiddleCov(cfg.middle)
    variables = mid.init(jax.random.PRNGKey(0), feats, geo, False)

    convs = jax.jit(lambda v, f: mid.apply(v, f, geo, False))
    timeit("C band convs on fixed plans (1 frame)", convs,
           variables, feats, n=reps)


if __name__ == "__main__":
    main()
