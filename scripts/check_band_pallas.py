"""On-TPU validation + microbench of the fused Pallas band conv.

Compares engine="band" (auto -> Pallas on TPU) against the rulebook
engine through SparseMiddleCov at KITTI scale, then times a single
L0 submanifold conv through each path (fori_loop-chained, one fetch —
the honest methodology from CLAUDE.md).

Usage: python -u scripts/check_band_pallas.py [reps]
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
from rslo_tpu.models.middle import (build_band_geometry, build_geometry)
from rslo_tpu.ops import band_conv as bc
from rslo_tpu.ops import sparse_conv as sc
from rslo_tpu.utils.synthetic import synth_sequence


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = PipelineCfg()
    # Model-linearization shape (nz+1, ny, nx) — net.py::sparse_shape.
    # (vcfg.grid_size is (nx, ny, nz); using it here aliased voxel ids.)
    nx, ny, nz = voxelizer_config(cfg).grid_size
    grid = (int(nz) + 1, int(ny), int(nx))
    caps = cfg.middle.level_capacities

    frames, _ = synth_sequence(seed=0, n_frames=1, n_points=131072)
    pts = jnp.asarray(frames[0][None])
    msk = jnp.ones((1, pts.shape[1]), bool)
    ex = prepare_example(pts, msk, voxelizer_config(cfg), mean_mode=True)
    coords = ex["coords"][0]
    vmask = ex["voxel_mask"][0]
    feats = ex["voxel_features"][0]
    print("occupied voxels:", int(np.asarray(vmask).sum()), flush=True)

    geo_rb = jax.jit(lambda c, m: build_geometry(c, m, grid, caps))(
        coords, vmask)
    geo_bd = jax.jit(lambda c, m: build_band_geometry(c, m, grid, caps))(
        coords, vmask)

    rng = np.random.default_rng(0)
    C = 16
    v0 = geo_rb.levels[0].mask.shape[0]  # voxelizer cap, not caps[0]
    f = jnp.asarray(rng.normal(size=(v0, C)).astype(np.float32))
    f = jnp.where(geo_rb.levels[0].mask[:, None], f, 0.0)
    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    # --- correctness: one L0 subm conv, bf16 compute both paths
    ref = jax.jit(lambda f: sc.sparse_conv_apply(
        f.astype(jnp.bfloat16), geo_rb.sub_rb[0], w.astype(jnp.bfloat16),
        b, geo_rb.levels[0].mask))(f)
    out = jax.jit(lambda f: bc.band_conv_apply(
        f, geo_bd.sub_rb[0], w, b, geo_rb.levels[0].mask,
        impl="pallas"))(f)
    ref_h, out_h = np.asarray(ref, np.float32), np.asarray(out)
    err = np.abs(out_h - ref_h).max()
    rel = err / (np.abs(ref_h).max() + 1e-9)
    print(f"L0 subm conv max abs err {err:.5f} (rel {rel:.2e})", flush=True)
    assert rel < 2e-2, "pallas band conv diverges from rulebook"

    # --- backward: tap-flip transpose kernel vs rulebook VJP
    def loss_band(f_, w_):
        o = bc.band_conv_apply(f_, geo_bd.sub_rb[0], w_, b,
                               geo_rb.levels[0].mask, impl="pallas")
        return jnp.sum(o * o)

    def loss_rb(f_, w_):
        o = sc.sparse_conv_apply(f_.astype(jnp.bfloat16),
                                 geo_rb.sub_rb[0],
                                 w_.astype(jnp.bfloat16), b,
                                 geo_rb.levels[0].mask)
        return jnp.sum(o * o)

    (df_b, dw_b) = jax.jit(jax.grad(loss_band, argnums=(0, 1)))(f, w)
    (df_r, dw_r) = jax.jit(jax.grad(loss_rb, argnums=(0, 1)))(f, w)
    for name, gb, gr in (("df", df_b, df_r), ("dw", dw_b, dw_r)):
        gb, gr = np.asarray(gb, np.float32), np.asarray(gr, np.float32)
        grel = np.abs(gb - gr).max() / (np.abs(gr).max() + 1e-9)
        print(f"backward {name} rel err {grel:.2e}", flush=True)
        assert grel < 5e-2, f"band backward {name} diverges"

    # --- microbench: chained conv applications, single fetch
    def chain(apply):
        def run(f0):
            def body(_, acc):
                return apply(acc) * 0.1 + f0
            return jax.lax.fori_loop(0, reps, body, f0).sum()
        return jax.jit(run)

    # channel sweep: picks band_min_channels (per-level dispatch) from
    # data — at which width does the fused kernel overtake row gathers?
    for Cs in (16, 32, 64, 128):
        fs = jnp.asarray(rng.normal(size=(v0, Cs)).astype(np.float32))
        fs = jnp.where(geo_rb.levels[0].mask[:, None], fs, 0.0)
        ws = jnp.asarray(
            rng.normal(size=(27, Cs, Cs)).astype(np.float32) * 0.1)
        pal = chain(lambda x, ws=ws: bc.band_conv_apply(
            x, geo_bd.sub_rb[0], ws, None, geo_rb.levels[0].mask,
            impl="pallas"))
        xla = chain(lambda x, ws=ws: sc.sparse_conv_apply(
            x.astype(jnp.bfloat16), geo_rb.sub_rb[0],
            ws.astype(jnp.bfloat16), None, geo_rb.levels[0].mask))
        for name, fn in [("band-pallas", pal), ("rulebook-gather", xla)]:
            np.asarray(fn(fs))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(fn(fs))
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"{name:18s} {dt:7.3f} ms / L0 subm conv (C={Cs})",
                  flush=True)


if __name__ == "__main__":
    main()
