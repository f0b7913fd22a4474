"""Benchmark: steady-state two-frame odometry inference throughput on the
KITTI-scale workload (one chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline context: the reference publishes no numbers (SURVEY.md §6); the
driver's north star is >=2x the reference GPU frames/s per chip.  The
RA-L paper's pipeline runs ~10 Hz-class on a V100-era GPU; we report
absolute frames/s and vs_baseline against BASELINE_FPS below.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import rslo_tpu.utils.jax_cache  # noqa: F401

import numpy as np

# Reference GPU throughput estimate for the full two-frame pipeline
# (P100/V100-era hardware per Dockerfile; RSLO-class sparse-conv LiDAR
# odometry nets run ~8-12 fps there).  Conservative baseline: 10 fps.
BASELINE_FPS = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from rslo_tpu.config.schema import PipelineCfg
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.utils.synthetic import synth_sequence

    import dataclasses
    cfg = PipelineCfg()  # full KITTI-scale defaults
    middle = os.environ.get("RSLO_BENCH_MIDDLE", "PillarMiddleCov")
    engine = os.environ.get("RSLO_BENCH_ENGINE", cfg.middle.engine)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_length=2),
        middle=dataclasses.replace(cfg.middle, name=middle,
                                   engine=engine))
    net = OdomNet(cfg)
    vcfg = voxelizer_config(cfg)

    n_points = cfg.data.max_points
    frames, _ = synth_sequence(seed=0, n_frames=2, n_points=n_points)
    pts = jnp.asarray(np.stack(frames))
    mask = jnp.ones(pts.shape[:2], bool)

    from rslo_tpu.data.prepare import mean_vfe_ok
    mean_mode = mean_vfe_ok(cfg)

    @jax.jit
    def forward(variables, pts, mask):
        ex = prepare_example(pts, mask, vcfg, mean_mode=mean_mode)
        return net.apply(variables, ex, train=False)["odometry"]

    t0 = time.time()
    example = jax.jit(
        lambda p, m: prepare_example(p, m, vcfg))(pts, mask)
    jax.block_until_ready(example)
    print(f"# voxelize compile+run: {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example, train=False)
    jax.block_until_ready(variables)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    out = forward(variables, pts, mask)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"# forward compile: {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    # steady state: each call voxelizes BOTH frames + full net forward.
    # NOTE: on the axon backend block_until_ready does NOT synchronize —
    # host fetches of the (1, 7) outputs are the only honest barrier.
    # Streaming deployment pipelines dispatch against compute, so we
    # enqueue the window then drain the outputs.
    np.asarray(forward(variables, pts, mask))  # warm
    n_iter = 16
    t0 = time.time()
    outs = [forward(variables, pts, mask) for _ in range(n_iter)]
    for o in outs:
        np.asarray(o)
    dt = (time.time() - t0) / n_iter
    fps = 1.0 / dt  # one new frame per step in odometry streaming

    print(json.dumps({
        "metric": "two_frame_odometry_inference",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
