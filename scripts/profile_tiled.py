"""Stage-wise profiler for the tiled dense middle engine (ops/tiled_conv).

Times each op class at KITTI-scale occupancy (each stage separately
jitted, honest host-fetch barrier) plus the full middle forward, and
reports the active-tile fill statistics that set the engine's waste
factor.  Usage: python scripts/profile_tiled.py
"""
import dataclasses
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
from rslo_tpu.models.net import OdomNet
from rslo_tpu.ops import tiled_conv as tc
from rslo_tpu.utils.synthetic import synth_sequence


def timeit(name, f, *a, n=3):
    t0 = time.perf_counter()
    out = np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.2f} ms   (compile {c:.1f}s)", flush=True)
    return dt


def main():
    cfg = PipelineCfg()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_length=2),
        middle=dataclasses.replace(cfg.middle, name="SparseMiddleCov",
                                   engine="tiles"))
    net = OdomNet(cfg)
    vcfg = voxelizer_config(cfg)
    frames, _ = synth_sequence(seed=0, n_frames=2,
                               n_points=cfg.data.max_points)
    pts = jnp.asarray(np.stack(frames))
    mask = jnp.ones(pts.shape[:2], bool)
    ex = jax.jit(lambda p, m: prepare_example(p, m, vcfg,
                                              mean_mode=True))(pts, mask)
    coords, vmask = ex["coords"][0], ex["voxel_mask"][0]
    vf = ex["voxel_features"][0]
    sparse_shape = net.sparse_shape
    caps = cfg.middle.tile_capacities
    tile = tuple(cfg.middle.tile_shape)
    print(f"sparse_shape={sparse_shape} caps={caps} tile={tile}",
          flush=True)

    geo_f = jax.jit(lambda c, m: tc.build_tiled_geometry(
        c, m, sparse_shape, caps, tile))
    geo = geo_f(coords, vmask)
    # fill statistics
    t0n = int(np.asarray(geo.l0.tile_mask.sum()))
    t1n = int(np.asarray(geo.l1.tile_mask.sum()))
    v0 = int(np.asarray(vmask.sum()))
    occ0 = int(np.asarray(geo.l0.occ.sum()))
    occ1 = int(np.asarray(geo.l1.occ.sum()))
    cells = int(np.prod(tile))
    print(f"V0={v0}  L0 tiles {t0n}/{caps[0]} fill {occ0/(t0n*cells):.3f}"
          f"  L1 tiles {t1n}/{caps[1]} fill {occ1/(max(t1n,1)*cells):.3f}",
          flush=True)
    print(f"occ2 {int(np.asarray(geo.occ2.sum()))}/{geo.occ2.size}"
          f"  occ3 {int(np.asarray(geo.occ3.sum()))}/{geo.occ3.size}",
          flush=True)

    timeit("geometry build", geo_f, coords, vmask)

    rng = jax.random.PRNGKey(0)
    c0, c1, c2, c3 = cfg.middle.channels

    def w(k, cin, cout):
        return jax.random.normal(rng, (k, cin, cout), jnp.float32) * 0.05

    V = vf.shape[0]
    f0 = jax.jit(lambda f: tc.scatter_voxels(f, geo.cell_index, geo.l0))(
        jnp.zeros((V, c0), jnp.float32))
    timeit("scatter_voxels (V,16)->L0", jax.jit(
        lambda f: tc.scatter_voxels(f, geo.cell_index, geo.l0)),
        jnp.zeros((V, c0)))

    sub0 = jax.jit(lambda x: tc.subm_conv(x, geo.l0, w(27, c0, c0),
                                          jnp.zeros(c0)))
    timeit("subm L0 16->16", sub0, f0)
    timeit("halo L0 only", jax.jit(lambda x: tc.halo(x, geo.l0)), f0)

    dwn0 = jax.jit(lambda x: tc.down_conv(x, geo.l0, geo.l1,
                                          w(27, c0, c1), jnp.zeros(c1)))
    x1 = dwn0(f0)
    timeit("down L0->L1 16->32", dwn0, f0)
    sub1 = jax.jit(lambda x: tc.subm_conv(x, geo.l1, w(27, c1, c1),
                                          jnp.zeros(c1)))
    timeit("subm L1 32->32", sub1, x1)

    pad2 = tuple(geo.l1.tgrid[d] * geo.l1.half[d] for d in range(3))
    dwn1 = jax.jit(lambda x: tc.down_to_dense(x, geo.l1, pad2,
                                              w(27, c1, c2),
                                              jnp.zeros(c2), geo.occ2))
    x2 = dwn1(x1)
    timeit("down L1->dense L2 32->64", dwn1, x1)
    sub2 = jax.jit(lambda x: tc.dense_subm_conv(x, geo.occ2,
                                                w(27, c2, c2),
                                                jnp.zeros(c2)))
    timeit("dense subm L2 64->64", sub2, x2)
    dwn2 = jax.jit(lambda x: tc.dense_down_conv(
        x, geo.occ3, w(27, c2, c3), jnp.zeros(c3), (3, 3, 3), (2, 2, 2),
        (0, 1, 1)))
    x3 = dwn2(x2)
    timeit("dense down L2->L3 64->64", dwn2, x2)
    sub3 = jax.jit(lambda x: tc.dense_subm_conv(x, geo.occ3,
                                                w(27, c3, c3),
                                                jnp.zeros(c3)))
    timeit("dense subm L3 64->64", sub3, x3)
    zc = jax.jit(lambda x: tc.zcollapse_conv(x, geo.occ4,
                                             w(3, c3, c3),
                                             jnp.zeros(c3)))
    timeit("zcollapse L3->L4", zc, x3)

    inv0 = jax.jit(lambda x: tc.inverse_from_dense(x, geo.l1,
                                                   w(27, c2, c1),
                                                   jnp.zeros(c1)))
    y1 = inv0(x2)
    timeit("inverse dense L2->L1 64->32", inv0, x2)
    inv1 = jax.jit(lambda x: tc.inverse_from_tiles(x, geo.l1, geo.l0,
                                                   w(27, c1, c0),
                                                   jnp.zeros(c0)))
    y0 = inv1(y1)
    timeit("inverse tiles L1->L0 32->16", inv1, y1)
    timeit("gather_voxels L0->(V,16)", jax.jit(
        lambda x: tc.gather_voxels(x, geo.cell_index)), y0)

    # full forward for the total (both frames, whole net)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ex, train=False)

    @jax.jit
    def full(v, p, m):
        e = prepare_example(p, m, vcfg, mean_mode=True)
        return net.apply(v, e, train=False)["odometry"]

    dt = timeit("FULL fwd (2 frames)", full, variables, pts, mask)
    print(f"=> {1.0/dt:.2f} frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
