"""Probe the net's sensitivity to true inter-frame motion.

Takes one proxy window, artificially shifts the SECOND frame's points
by known offsets, and reports how the predicted translation responds.
A healthy pair-correlation path must track the shift ~1:1; an
input-insensitive head (collapse to prior) won't.

Usage: python scripts/diag_sensitivity.py [middle] [--supervised]
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("RSLO_CPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent))
from accuracy_proxy import base_cfg, _model_dir  # noqa: E402


def main(middle: str, supervised: bool):
    from jax.sharding import Mesh
    from rslo_tpu.data.dataset import KittiWindowDataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    from rslo_tpu.train.loop import Trainer

    cfg = base_cfg(middle, 100)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, seq_length=2))
    vcfg = voxelizer_config(cfg)
    ds = KittiWindowDataset(cfg.data, "val", seq_length=2)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    trainer = Trainer(cfg, _model_dir(middle, supervised), mesh)
    net = trainer.net

    b0 = collate([ds[5]], cfg.data)
    pts = np.asarray(b0["points"][0])          # (L, N, F)
    pm = np.asarray(b0["point_mask"][0])
    ex0 = jax.jit(lambda p, m: prepare_example(p, m, vcfg))(
        jnp.asarray(pts), jnp.asarray(pm))
    ex0["odometry"] = jnp.asarray(b0["odometry"][0])
    state = trainer.init_state(ex0)
    print("restored step:", int(state.step), flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(v, p, m):
        e = prepare_example(p, m, vcfg)
        return net.apply(v, e, train=False)["odometry"]

    gt = np.asarray(b0["odometry"][0][0])
    base = np.asarray(fwd(variables, jnp.asarray(pts),
                          jnp.asarray(pm)))[0]
    print("gt  :", np.round(gt[:3], 3))
    print("pred:", np.round(base[:3], 3))
    for dx in (-1.0, -0.5, 0.5, 1.0):
        p2 = pts.copy()
        # shifting frame-1 points by -dx along x INCREASES the relative
        # motion frame0->frame1 by +dx (points are in sensor frame)
        p2[1, :, 0] += -dx
        o = np.asarray(fwd(variables, jnp.asarray(p2),
                           jnp.asarray(pm)))[0]
        print(f"shift dx={dx:+.1f}: pred {np.round(o[:3], 3)} "
              f"(delta {np.round(o[:3] - base[:3], 3)})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "PillarMiddleCov",
         "--supervised" in sys.argv)
