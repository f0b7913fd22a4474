"""Train-step profiler: full self-supervised step (fwd+bwd+update) on the
current backend at KITTI scale, single device.

Usage: python scripts/profile_train.py [sparse|pillar] [n_frames]
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rslo_tpu.config.schema import PipelineCfg
from rslo_tpu.data.prepare import prepare_example, voxelizer_config
from rslo_tpu.models.net import OdomNet
from rslo_tpu.train.optim import build_optimizer
from rslo_tpu.train.state import TrainState
from rslo_tpu.train.step import make_train_step
from rslo_tpu.utils.synthetic import synth_sequence


def main(middle: str, L: int):
    name = {"sparse": "SparseMiddleCov",
            "pillar": "PillarMiddleCov"}[middle]
    cfg = PipelineCfg()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_length=L),
        middle=dataclasses.replace(cfg.middle, name=name))
    net = OdomNet(cfg)
    vcfg = voxelizer_config(cfg)
    frames, gts = synth_sequence(seed=0, n_frames=L,
                                 n_points=cfg.data.max_points)
    n_pairs = L * (L - 1) // 2
    gt = np.zeros((n_pairs, 7), np.float32)
    gt[:, 3] = 1
    batch = {
        "points": jnp.asarray(np.stack(frames))[None],
        "point_mask": jnp.ones((1, L, cfg.data.max_points), bool),
        "odometry": jnp.asarray(gt)[None],
    }
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    ex = jax.jit(lambda p, m: prepare_example(p, m, vcfg))(
        batch["points"][0], batch["point_mask"][0])
    ex["odometry"] = batch["odometry"][0]
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ex, train=False)
    tx = build_optimizer(cfg.optimizer, cfg.train)
    state = TrainState.create(variables, tx, {"rot": -2.5, "trans": 0.0})
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    step = make_train_step(net, tx, cfg, mesh, warmup=False)
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    print(f"[{middle} L={L}] compile+first: "
          f"{time.perf_counter()-t0:.1f}s loss={loss:.3f}", flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # host fetch = honest barrier
    dt = (time.perf_counter() - t0) / n
    print(f"[{middle} L={L}] train step: {dt*1e3:.1f} ms "
          f"({1.0/dt:.2f} steps/s) loss={loss:.3f}", flush=True)


if __name__ == "__main__":
    middle = sys.argv[1] if len(sys.argv) > 1 else "pillar"
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(middle, L)
