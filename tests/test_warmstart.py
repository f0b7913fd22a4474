"""Warm-start (pretrained param surgery) across differing middles.

Reference parity: train_hdf5.py:416-446 pretrained_path with
include/exclude — here driven through Trainer.init_state(pretrained=)
so a SparseMiddleCov run can inherit a PillarMiddleCov run's bev_net.
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh


@pytest.fixture(scope="module")
def tiny():
    sys.path.insert(0, "tests")
    from test_model import tiny_cfg
    return tiny_cfg()


def _example(cfg):
    from rslo_tpu.cli import _synthetic_dataset
    from rslo_tpu.data.loader import collate
    from rslo_tpu.data.prepare import prepare_example, voxelizer_config
    ds = _synthetic_dataset(cfg, "train", n_windows=1)
    b = collate([ds[0]], cfg.data)
    ex = prepare_example(jnp.asarray(b["points"][0]),
                         jnp.asarray(b["point_mask"][0]),
                         voxelizer_config(cfg))
    ex["odometry"] = jnp.asarray(b["odometry"][0])
    return ex


def test_warmstart_across_middles(tiny, tmp_path):
    from rslo_tpu.train.loop import Trainer

    cfg_a = tiny
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    tr_a = Trainer(cfg_a, str(tmp_path / "a"), mesh)
    ex = _example(cfg_a)
    st_a = tr_a.init_state(ex)
    # perturb so the transfer is distinguishable from a fresh same-seed
    # init (init is seed-deterministic across same-shape nets)
    st_a = st_a.replace(params=jax.tree.map(lambda x: x + 0.25,
                                            st_a.params))
    tr_a.ckpt.save(1, jax.device_get(st_a))

    # different middle (pillar) — bev_net/alphas transfer, middle won't
    cfg_b = cfg_a.replace(middle=dataclasses.replace(
        cfg_a.middle, name="PillarMiddleCov"))
    tr_b = Trainer(cfg_b, str(tmp_path / "b"), mesh)
    ex_b = _example(cfg_b)
    st_b = tr_b.init_state(ex_b, pretrained=str(tmp_path / "a"))

    a_bev = jax.tree.leaves(st_a.params["bev_net"])
    b_bev = jax.tree.leaves(st_b.params["bev_net"])
    assert len(a_bev) == len(b_bev)
    same = [np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(a_bev, b_bev)]
    # all shape-matching bev leaves must be copied
    assert np.mean(same) > 0.9, f"only {np.mean(same):.2f} copied"
    # fresh run (no pretrained) differs from the warm-started one
    st_c = tr_b.init_state(ex_b)
    c_bev = jax.tree.leaves(st_c.params["bev_net"])
    diff = [not np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(b_bev, c_bev)]
    assert any(diff)
