"""Stage breakdown of the RULEBOOK sparse path (the committed default
engine, bench sparse_fps 5.15): voxelize | plan build (slot_map) |
convs with plans closed over | plan+convs traced — same honest
single-fetch methodology as profile_band_stages.py.

The answer picks the round-5 lever for VERDICT #2 (sparse >= 10 fps):
plan-build dominated -> incremental/streaming plan reuse; conv
dominated -> gather layout (bf16 rows, plane-grouped taps) or per-level
engine dispatch.

Usage: python -u scripts/profile_sparse_stages.py [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

from rslo_tpu.config.schema import PipelineCfg, grid_size
from rslo_tpu.data.prepare import prepare_example, voxelizer_config
from rslo_tpu.models.middle import build_geometry, SparseMiddleCov
from rslo_tpu.utils.synthetic import synth_sequence


def timeit_chain(name, f, x, n, perturb):
    def run(x0):
        def body(_, acc):
            out = f(perturb(x0, acc))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    g = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(g(x))
    print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(g(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import dataclasses
    cfg = PipelineCfg()
    cfg = cfg.replace(middle=dataclasses.replace(
        cfg.middle, name="SparseMiddleCov", engine="rulebook"))
    vcfg = voxelizer_config(cfg)
    nx, ny, nz = grid_size(cfg.voxelizer)
    sparse_shape = (nz + 1, ny, nx)
    caps = cfg.middle.level_capacities
    print(f"sparse_shape={sparse_shape} caps={caps}", flush=True)

    frames, _ = synth_sequence(seed=0, n_frames=1,
                               n_points=cfg.data.max_points)
    pts = jnp.asarray(frames[0][None])
    msk = jnp.ones((1, pts.shape[1]), bool)

    vox_fn = lambda p: prepare_example(p, msk, vcfg, mean_mode=True)
    timeit_chain("A voxelize+meanVFE (1 frame)", vox_fn, pts, reps,
                 perturb=lambda p, acc: p + acc * 1e-30)

    ex = jax.jit(vox_fn)(pts)
    coords, vmask = ex["coords"][0], ex["voxel_mask"][0]
    feats = ex["voxel_features"][0]

    geo_fn = lambda c, m: build_geometry(
        c, m, sparse_shape, caps, lookup=cfg.middle.plan_lookup)
    timeit_chain("B rulebook plan build (1 frame, all levels)",
                 lambda m: geo_fn(coords, m), vmask, reps,
                 perturb=lambda m, acc: m != (acc > 1e30))

    geo = jax.jit(geo_fn)(coords, vmask)
    mid = SparseMiddleCov(cfg.middle)
    variables = mid.init(jax.random.PRNGKey(0), feats, geo, False)

    timeit_chain("C rulebook convs, plans as jit consts (1 frame)",
                 lambda f: mid.apply(variables, f, geo, False),
                 feats, reps,
                 perturb=lambda f, acc: f + acc * 1e-30)

    def build_and_conv(m):
        g = geo_fn(coords, m)
        return mid.apply(variables, feats, g, False)

    dt_b = timeit_chain("B' (re-run for residual)",
                        lambda m: geo_fn(coords, m), vmask, reps,
                        perturb=lambda m, acc: m != (acc > 1e30))
    dt_d = timeit_chain("D plan build + convs, plans traced (1 frame)",
                        build_and_conv, vmask, reps,
                        perturb=lambda m, acc: m != (acc > 1e30))
    print(f"D-B traced-conv residual: {(dt_d - dt_b) * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
