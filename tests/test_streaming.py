"""Streaming odometry: cached-BEV pipeline consistent with the
stateless two-frame path."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_streaming_matches_two_frame():
    import sys
    sys.path.insert(0, "tests")
    from test_model import tiny_cfg, make_example
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.eval.streaming import StreamingOdometry
    from rslo_tpu.cli import _synthetic_dataset

    cfg = tiny_cfg()
    cfg = cfg.replace(
        middle=dataclasses.replace(cfg.middle, name="PillarMiddleCov"),
        data=dataclasses.replace(cfg.data, seq_length=2,
                                 max_points=4000))
    net = OdomNet(cfg)
    rng = np.random.default_rng(1)
    example = make_example(rng, cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)

    ds = _synthetic_dataset(cfg, "val", n_windows=3)
    s = ds[0]

    # stateless two-frame prediction
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    from rslo_tpu.data.loader import collate
    vcfg = voxelizer_config(cfg)
    b = collate([s], cfg.data)
    ex = prepare_example(jnp.asarray(b["points"][0]),
                         jnp.asarray(b["point_mask"][0]), vcfg)
    two_frame = np.asarray(
        net.apply(variables, ex, train=False)["odometry"])[0]

    # streaming path over the same two scans
    stream = StreamingOdometry(net, variables, cfg)
    p0 = stream.push(b["points"][0, 0], b["point_mask"][0, 0])
    np.testing.assert_allclose(p0, [0, 0, 0, 1, 0, 0, 0])
    p1 = stream.push(b["points"][0, 1], b["point_mask"][0, 1])
    # pose after frame 2 == the two-frame relative prediction
    np.testing.assert_allclose(p1, two_frame, atol=1e-3)
    assert len(stream.trajectory) == 2
