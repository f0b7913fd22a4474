"""End-to-end model + objective integration tests on tiny shapes (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rslo_tpu.config.schema import (PipelineCfg, VoxelizerCfg, MiddleCfg,
                                    OdomCfg, LossCfg)
from rslo_tpu.models.net import OdomNet
from rslo_tpu.ops.voxelize import VoxelizerConfig, voxelize
from rslo_tpu.losses.objective import compute_objective


def tiny_cfg():
    return PipelineCfg(
        voxelizer=VoxelizerCfg(
            point_cloud_range=(-6.4, -6.4, -0.8, 6.4, 6.4, 0.8),
            voxel_size=(0.1, 0.1, 0.04), max_points_per_voxel=4,
            max_voxels=2048),
        middle=MiddleCfg(level_capacities=(2048, 2048, 1024, 512),
                         channels=(8, 8, 16, 16)),
        odom=OdomCfg(num_input_features=32, layer_nums=(1, 1, 1),
                     num_filters=(16, 16, 32),
                     num_upsample_filters=(16, 16, 16),
                     bn_type="bn"),
        loss=LossCfg(max_loss_points=2048),
    )


def make_example(rng, cfg, L=2):
    vcfg = VoxelizerConfig(
        point_cloud_range=cfg.voxelizer.point_cloud_range,
        voxel_size=cfg.voxelizer.voxel_size,
        max_points=cfg.voxelizer.max_points_per_voxel,
        max_voxels=cfg.voxelizer.max_voxels)
    voxels, nums, coords, masks = [], [], [], []
    base = rng.uniform(-6, 6, size=(4000, 2)).astype(np.float32)
    for t in range(L):
        xy = base + t * 0.05
        z = rng.uniform(-0.7, 0.7, size=(4000, 1)).astype(np.float32)
        inten = rng.uniform(0, 1, size=(4000, 1)).astype(np.float32)
        nrm = rng.normal(size=(4000, 3)).astype(np.float32)
        pts = np.concatenate([xy, z, inten, nrm], axis=1)
        out = voxelize(jnp.asarray(pts), jnp.ones(4000, bool), vcfg)
        voxels.append(out.voxels)
        nums.append(out.num_points)
        coords.append(out.coords)
        masks.append(out.mask)
    n_pairs = L * (L - 1) // 2
    gt = np.zeros((n_pairs, 7), np.float32)
    gt[:, 3] = 1.0
    gt[:, 0] = 0.05 * 1.41
    return {
        "voxels": jnp.stack(voxels),
        "num_points": jnp.stack(nums),
        "coords": jnp.stack(coords),
        "voxel_mask": jnp.stack(masks),
        "odometry": jnp.asarray(gt),
    }


@pytest.fixture(scope="module")
def model_and_state():
    rng = np.random.default_rng(1)
    cfg = tiny_cfg()
    example = make_example(rng, cfg)
    net = OdomNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), example, train=False)
    return cfg, net, variables, example


def test_forward_shapes(model_and_state):
    cfg, net, variables, example = model_and_state
    preds = net.apply(variables, example, train=False)
    assert preds["odometry"].shape == (1, 7)
    q = np.asarray(preds["odometry"][:, 3:])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)
    # BEV grid is 128x128 -> 1/8 = 16x16
    assert preds["tq_map"].shape == (1, 16, 16, 7)
    assert preds["t_conf"].shape == (1, 16, 16, 1)
    # softmax confidences sum to 1 over the map
    np.testing.assert_allclose(
        np.asarray(preds["t_conf"]).sum(), 1.0, atol=1e-3)
    assert len(preds["pyramid"]) == 3
    assert preds["voxel_covs"][0].shape == (2048, 7)
    # eigenvalue params positive at valid voxels
    cov = np.asarray(preds["voxel_covs"][0])
    m = np.asarray(preds["voxel_masks"][0])
    assert np.all(cov[m][:, :3] > 0)
    assert np.all(np.isfinite(np.asarray(preds["tq_map"])))


def test_objective_supervised(model_and_state):
    cfg, net, variables, example = model_and_state
    preds = net.apply(variables, example, train=False)
    alphas = {"rot": jnp.float32(-2.5), "trans": jnp.float32(0.0)}
    out = compute_objective(preds, example, alphas, cfg.loss,
                            cfg.voxelizer.point_cloud_range,
                            warmup=False, self_supervised=False)
    assert np.isfinite(float(out.total))
    assert float(out.aux["C_loss"]) == 0.0
    assert float(out.aux["pyramid_loss"]) != 0.0


@pytest.mark.slow
def test_objective_self_supervised_and_grads(model_and_state):
    cfg, net, variables, example = model_and_state
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, alphas):
        preds, _ = net.apply({"params": p, **other}, example, train=True,
                             mutable=["batch_stats"])
        out = compute_objective(preds, example, alphas, cfg.loss,
                                cfg.voxelizer.point_cloud_range,
                                warmup=True, self_supervised=True)
        return out.total, out.aux

    alphas = {"rot": jnp.float32(-2.5), "trans": jnp.float32(0.0)}
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, alphas)
    assert np.isfinite(float(loss)), aux
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in flat)))
    assert np.isfinite(gnorm) and gnorm > 0
    # consistency produced a finite ICP correction
    assert np.isfinite(float(aux["consistency_loss"]))


def test_self_supervised_identity_pair_low_loss(model_and_state):
    """Two identical frames + identity warmup: the ICP correction should
    be near identity and the consistency data term small."""
    cfg, net, variables, example = model_and_state
    ex = dict(example)
    for k in ("voxels", "num_points", "coords", "voxel_mask"):
        ex[k] = jnp.stack([example[k][0], example[k][0]])
    preds = net.apply(variables, ex, train=False)
    alphas = {"rot": jnp.float32(0.0), "trans": jnp.float32(0.0)}
    out = compute_objective(preds, ex, alphas, cfg.loss,
                            cfg.voxelizer.point_cloud_range,
                            warmup=True, self_supervised=True)
    # identical clouds -> associations are exact -> tiny Mahalanobis term
    assert float(out.aux["consistency_loss"]) < 1.0


def test_normalized_mask_conv_partial_invariance(rng):
    """SparseConv conv_type (rslo/layers/SparseConv.py:222-302): with
    all-ones kernel weights a constant field stays constant at every
    cell with >=1 valid tap, regardless of the mask pattern."""
    from rslo_tpu.models.bev_net import MaskConv
    x = jnp.full((1, 8, 8, 3), 2.5)
    mask = jnp.asarray(rng.random((1, 8, 8, 1)) > 0.5, jnp.float32)
    mod = MaskConv(4, 3, 1, use_bias=True, normalized=True)
    v = mod.init(jax.random.PRNGKey(0), x, mask)
    v = jax.tree.map(jnp.ones_like, v)  # all-ones kernel, bias=1
    y, m = mod.apply(v, x, mask)
    # y = sum over valid taps of (1 * 2.5 * sum_c 1) / count + 1
    want = 2.5 * 3 + 1.0
    valid = np.asarray(m[0, :, :, 0]) > 0
    np.testing.assert_allclose(np.asarray(y[0][valid]), want, rtol=1e-5)
    # propagated mask == max-pooled mask
    from rslo_tpu.models.bev_net import max_pool_mask
    np.testing.assert_array_equal(np.asarray(m),
                                  np.asarray(max_pool_mask(mask, 3, 1)))


def test_norm_noise_injection(rng):
    """SPC wrappers' per-channel noise option (SparseConv.py:22-219):
    train-time (x + shift)*scale with per-channel gaussians; eval and
    std=0 paths are noise-free and need no rng stream."""
    from rslo_tpu.models.bev_net import Norm
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    mod = Norm("bn", noise_scale_std=0.3, noise_shift_std=0.2)
    v = mod.init({"params": jax.random.PRNGKey(0),
                  "bn_noise": jax.random.PRNGKey(1)}, x, train=True)
    y1, _ = mod.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"bn_noise": jax.random.PRNGKey(2)})
    y2, _ = mod.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"bn_noise": jax.random.PRNGKey(3)})
    d = np.asarray(y1 - y2)
    assert np.abs(d).max() > 1e-3                  # noise is applied
    # per-channel affine: within a channel the two outputs are related
    # by one (shift, scale) pair -> d varies per channel, and eval mode
    # is deterministic without an rng stream
    ye1 = mod.apply(v, x, train=False)
    ye2 = mod.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(ye1), np.asarray(ye2))
    # std=0: no rng stream needed in train mode (deployed-config path)
    mod0 = Norm("bn")
    v0 = mod0.init(jax.random.PRNGKey(0), x, train=True)
    mod0.apply(v0, x, train=True, mutable=["batch_stats"])


def test_sparse_conv_type_forward(rng):
    """conv_type='sparse_conv' wires through the BEV net."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = cfg.replace(odom=dataclasses.replace(
        cfg.odom, conv_type="sparse_conv"))
    net = OdomNet(cfg)
    ex = make_example(rng, cfg)
    variables = net.init(jax.random.PRNGKey(0), ex, train=False)
    preds = net.apply(variables, ex, train=False)
    assert np.isfinite(np.asarray(preds["odometry"])).all()


def test_confidence_head_tempered_shares_logits(rng):
    """The tempered confidence equals a plain call at that temperature
    (one conv-stem pass serves both); linear mode ignores temperature."""
    from rslo_tpu.models.bev_net import ConfidenceHead
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    m = jnp.ones((1, 8, 8, 1), np.float32)
    head = ConfidenceHead(bn_type="none", conf_type="softmax")
    v = head.init(jax.random.PRNGKey(0), x, m, False)
    conf, temp = head.apply(v, x, m, False, tempered=20.0)
    plain = head.apply(v, x, m, False, temperature=20.0)
    np.testing.assert_allclose(np.asarray(temp), np.asarray(plain),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(conf), np.asarray(temp))
    # softmax confidences sum to 1 over the masked grid
    np.testing.assert_allclose(np.asarray(conf).sum(), 1.0, rtol=1e-5)
    # linear mode: temperature has no effect, tempered==main
    lin = ConfidenceHead(bn_type="none", conf_type="linear")
    vl = lin.init(jax.random.PRNGKey(0), x, m, False)
    c1, c2 = lin.apply(vl, x, m, False, tempered=20.0)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)
    assert (np.asarray(c1) > 0).all()


@pytest.mark.parametrize("block", ["fire", "bottleneck"])
def test_block_type_variants_forward(rng, block):
    """fire / bottleneck BEV blocks (custom_resnet_spc.py FireBlock /
    Bottleneck) produce finite predictions at the configured widths."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = cfg.replace(odom=dataclasses.replace(cfg.odom,
                                               block_type=block))
    net = OdomNet(cfg)
    ex = make_example(rng, cfg)
    variables = net.init(jax.random.PRNGKey(0), ex, train=False)
    preds = net.apply(variables, ex, train=False)
    assert np.isfinite(np.asarray(preds["odometry"])).all()
    assert preds["tq_map"].shape[-1] == 7


def test_block_type_validation(rng):
    import dataclasses
    cfg = tiny_cfg()
    cfg = cfg.replace(odom=dataclasses.replace(cfg.odom,
                                               block_type="firee"))
    net = OdomNet(cfg)
    ex = make_example(rng, cfg)
    with pytest.raises(AssertionError, match="firee"):
        net.init(jax.random.PRNGKey(0), ex, train=False)


def test_multi_level_odom_output(rng):
    """odom.multi_level_odom emits per-pyramid-level odometry votes
    (coarse -> fine, final = the main conf-weighted vote)."""
    import dataclasses
    import jax
    from rslo_tpu.models.net import OdomNet
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config

    cfg = tiny_cfg()
    cfg = cfg.replace(
        middle=dataclasses.replace(cfg.middle, name="PillarMiddleCov"),
        odom=dataclasses.replace(cfg.odom, multi_level_odom=True))
    net = OdomNet(cfg)
    ex = make_example(rng, cfg, L=2)
    variables = net.init(jax.random.PRNGKey(0), ex, train=False)
    preds = net.apply(variables, ex, train=False)
    levels = preds["odometry_levels"]
    # deep supervision at 2 coarser levels + the final vote
    assert len(levels) == len(cfg.odom.upsample_strides)
    for lv in levels:
        assert lv.shape == preds["odometry"].shape
        assert np.isfinite(np.asarray(lv)).all()
    np.testing.assert_allclose(np.asarray(levels[-1]),
                               np.asarray(preds["odometry"]))
