"""Spatial partitioning (SP) of the BEV stage: sharded == unsharded.

GSPMD shards the BEV grid's width over a mesh axis and auto-inserts
the conv halo exchanges; the pose output must match the single-device
forward (parallel/spatial.py — the new parallel axis beyond the
reference's DDP-only scaling)."""
import sys

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

sys.path.insert(0, "tests")
from test_model import tiny_cfg, make_example  # noqa: E402

from rslo_tpu.models.net import OdomNet  # noqa: E402
from rslo_tpu.parallel.spatial import make_spatial_forward  # noqa: E402


@pytest.mark.parametrize("middle", ["PillarMiddleCov", "SparseMiddleCov"])
def test_spatial_forward_matches_single_device(middle):
    import dataclasses
    rng = np.random.default_rng(3)
    cfg = tiny_cfg()
    cfg = cfg.replace(middle=dataclasses.replace(cfg.middle, name=middle))
    example = make_example(rng, cfg)
    net = OdomNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)

    ref = jax.jit(lambda v, e: net.apply(v, e, train=False))(
        variables, example)

    n = min(4, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n]), ("space",))
    sp = make_spatial_forward(net, mesh, axis="space")
    out = sp(variables, example)

    for key in ("odometry", "tq_map", "t_conf"):
        a = np.asarray(ref[key], np.float32)
        b = np.asarray(out[key], np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4,
                                   err_msg=f"{middle}:{key}")

    # the BEV pair tensor really is sharded: check the compiled HLO
    # mentions a non-trivial sharding over the space axis
    txt = sp.lower(variables, example).compile().as_text()
    assert "collective-permute" in txt or "all-gather" in txt or \
        "all-reduce" in txt


def test_model_parallel_forward_matches_single_device():
    """TP axis (parallel/tensor.py): BEV channels sharded over a
    'model' mesh axis must reproduce the single-device pose."""
    rng = np.random.default_rng(4)
    cfg = tiny_cfg()
    example = make_example(rng, cfg)
    net = OdomNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)

    ref = jax.jit(lambda v, e: net.apply(v, e, train=False))(
        variables, example)

    from rslo_tpu.parallel.tensor import make_model_forward
    n = min(4, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n]), ("model",))
    mp = make_model_forward(net, mesh, axis="model")
    out = mp(variables, example)
    for key in ("odometry", "tq_map", "t_conf"):
        np.testing.assert_allclose(
            np.asarray(ref[key], np.float32),
            np.asarray(out[key], np.float32),
            rtol=2e-3, atol=2e-4, err_msg=key)
    txt = mp.lower(variables, example).compile().as_text()
    assert "all-gather" in txt or "all-reduce" in txt or \
        "reduce-scatter" in txt or "collective-permute" in txt


def test_spatial_model_2d_forward_matches_single_device():
    """SP x TP on one 2-D mesh (2 space x 2 model devices)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(5)
    cfg = tiny_cfg()
    example = make_example(rng, cfg)
    net = OdomNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)
    ref = jax.jit(lambda v, e: net.apply(v, e, train=False))(
        variables, example)

    from rslo_tpu.parallel.tensor import make_spatial_model_forward
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("space", "model"))
    f = make_spatial_model_forward(net, mesh)
    out = f(variables, example)
    for key in ("odometry", "tq_map", "t_conf"):
        np.testing.assert_allclose(
            np.asarray(ref[key], np.float32),
            np.asarray(out[key], np.float32),
            rtol=2e-3, atol=2e-4, err_msg=key)
