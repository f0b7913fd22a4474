"""Block/window sweep for the fused band conv kernel.

The clean r3c microbench showed the fused kernel at a C-INDEPENDENT
~3.4 ms per L0 subm conv (C=16..128) — the cost is per-(block, tap)
pipeline latency (two small MXU matmuls + a DMA wait per tap, 27 taps x
nB blocks serialized), not bandwidth or FLOPs.  Larger blocks amortize
that latency over more rows (fewer grid steps) at the price of a wider
window (the in-row spread grows with B) and a bigger one-hot.  This
sweeps (block, window) per level/channel pair and checks correctness
against the rulebook-gather oracle before timing.

Windows must be lane multiples (128); blocks sublane multiples.
Usage: python -u scripts/profile_band_tiles.py [reps]
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


def timeit_chain(name, f, x, n):
    def run(x0):
        def body(i, acc):
            out = f(x0 + acc * 1e-9)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    g = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(g(x))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(g(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:7.2f} ms  (compile {c:.0f}s)",
          flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = PipelineCfg()
    nx, ny, nz = voxelizer_config(cfg).grid_size
    grid = (int(nz) + 1, int(ny), int(nx))
    caps = cfg.middle.level_capacities

    frames, _ = synth_sequence(seed=0, n_frames=1, n_points=131072)
    pts = jnp.asarray(frames[0][None])
    msk = jnp.ones((1, pts.shape[1]), bool)
    ex = prepare_example(pts, msk, voxelizer_config(cfg), mean_mode=True)
    coords, vmask = ex["coords"][0], ex["voxel_mask"][0]
    geo = jax.jit(lambda c, m: build_geometry(c, m, grid, caps))(
        coords, vmask)

    rng = np.random.default_rng(0)
    # (level index, channels) pairs that matter in the deployed net
    cases = ((0, 16), (1, 32), (2, 64))
    for lvl_i, C in cases:
        lvl = geo.levels[lvl_i]
        rb = jax.jit(sc.build_submanifold_index)(lvl)
        v = lvl.capacity
        f = jnp.asarray(rng.normal(size=(v, C)).astype(np.float32))
        f = jnp.where(lvl.mask[:, None], f, 0.0)
        w = jnp.asarray(
            rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)

        # oracle through the rulebook path (bf16 like the model)
        ref = jax.jit(lambda f: sc.sparse_conv_apply(
            f, rb, w, out_mask=lvl.mask,
            compute_dtype=jnp.bfloat16))(f)

        for block, window in ((256, 384), (512, 512), (512, 768),
                              (1024, 1152), (256, 512)):
            band = jax.jit(lambda block=block, window=window:
                           bc.build_band_index(
                               rb, v, block=block, window=window,
                               self_transpose=True))()
            ovc = int(np.asarray(band.ov_count))
            impl = bc._pick_impl(band, None)
            if impl != "pallas":
                print(f"L{lvl_i} C={C} B={block} W={window}: "
                      f"impl={impl} ov={ovc} — skipped", flush=True)
                continue
            out = jax.jit(lambda f: bc.band_conv_apply(
                f, band, w, out_mask=lvl.mask,
                compute_dtype=jnp.bfloat16))(f)
            err = float(jnp.max(jnp.abs(out - ref)))
            tag = (f"L{lvl_i} C={C:3d} B={block} W={window} "
                   f"ov={ovc}")
            if err > 1e-3 * float(jnp.max(jnp.abs(ref)) + 1):
                print(f"{tag}: MISMATCH max err {err:.3e}", flush=True)
                continue
            timeit_chain(tag, lambda f, band=band: bc.band_conv_apply(
                f, band, w, out_mask=lvl.mask,
                compute_dtype=jnp.bfloat16), f, reps)


if __name__ == "__main__":
    main()
