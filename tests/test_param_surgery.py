"""Param surgery: filtering, renaming, partial load, freeze masks."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu.utils.param_surgery import (filter_params, flatten,
                                          freeze_mask, load_pretrained,
                                          rename_params, unflatten)


def tree():
    return {
        "middle": {"conv1": {"kernel": jnp.ones((2, 2)),
                             "bias": jnp.zeros((2,))}},
        "bev_net": {"block": {"kernel": jnp.full((3,), 2.0)}},
    }


def test_flatten_roundtrip():
    t = tree()
    f = flatten(t)
    assert set(f) == {"middle/conv1/kernel", "middle/conv1/bias",
                      "bev_net/block/kernel"}
    t2 = unflatten(f)
    assert jnp.all(t2["middle"]["conv1"]["kernel"] ==
                   t["middle"]["conv1"]["kernel"])


def test_filter_include_exclude():
    f = filter_params(tree(), include="middle", exclude="bias")
    assert set(f) == {"middle/conv1/kernel"}


def test_rename_and_load():
    pre = {"old_middle": {"conv1": {"kernel": jnp.full((2, 2), 7.0)}}}
    merged, loaded = load_pretrained(
        tree(), pre, rename_map={r"^old_middle": "middle"})
    assert loaded == ["middle/conv1/kernel"]
    assert float(merged["middle"]["conv1"]["kernel"][0, 0]) == 7.0
    # untouched leaves preserved
    assert float(merged["bev_net"]["block"]["kernel"][0]) == 2.0


def test_shape_mismatch_raises():
    pre = {"middle": {"conv1": {"kernel": jnp.ones((5, 5))}}}
    try:
        load_pretrained(tree(), pre)
        assert False, "expected ValueError"
    except ValueError:
        pass
    merged, loaded = load_pretrained(tree(), pre, strict_shapes=False)
    assert loaded == []


def test_freeze_mask():
    m = freeze_mask(tree(), r"^middle")
    assert m["middle"]["conv1"]["kernel"] is True
    assert m["bev_net"]["block"]["kernel"] is False
