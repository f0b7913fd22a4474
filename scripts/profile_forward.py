"""Forward-path profiler: times voxelize / geometry / full forward for
each middle variant on the current backend (honest host-fetch sync).

Usage: python scripts/profile_forward.py [sparse|pillar|all]
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
from rslo_tpu.utils.synthetic import synth_sequence


def timeit(name, f, *a, n=5):
    t0 = time.perf_counter()
    out = np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = np.asarray(jax.tree.leaves(f(*a))[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def profile(middle_name: str, engine: str = None):
    import os
    cfg = PipelineCfg()
    engine = engine or os.environ.get("RSLO_MIDDLE_ENGINE",
                                      cfg.middle.engine)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_length=2),
        middle=dataclasses.replace(cfg.middle, name=middle_name,
                                   engine=engine))
    net = OdomNet(cfg)
    vcfg = voxelizer_config(cfg)
    frames, _ = synth_sequence(seed=0, n_frames=2,
                               n_points=cfg.data.max_points)
    pts = jnp.asarray(np.stack(frames))
    mask = jnp.ones(pts.shape[:2], bool)

    ex = jax.jit(lambda p, m: prepare_example(p, m, vcfg))(pts, mask)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ex, train=False)

    @jax.jit
    def full(variables, pts, mask):
        e = prepare_example(pts, mask, vcfg)
        return net.apply(variables, e, train=False)["odometry"]

    dt = timeit(f"[{middle_name}] full fwd (2 frames)", full,
                variables, pts, mask)
    print(f"[{middle_name}] => {1.0/dt:.2f} frames/s/chip", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("pillar", "all"):
        profile("PillarMiddleCov")
    if which in ("sparse", "all"):
        profile("SparseMiddleCov")
