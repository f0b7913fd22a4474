"""String-name -> component registries (config-driven dispatch), the
analog of the reference's five registries
(/root/reference/rslo/models/voxel_odom_net.py:28-42, voxel_encoder.py:14-26,
middle.py:20-32, odom_pred.py:31-43, rslo/data/dataset.py:17-29)."""
from __future__ import annotations

_REGISTRIES: dict[str, dict[str, object]] = {
    "vfe": {}, "middle": {}, "odom": {}, "net": {}, "dataset": {},
}


def _register(kind: str, name: str | None = None):
    def deco(obj):
        key = name or obj.__name__
        reg = _REGISTRIES[kind]
        assert key not in reg, f"duplicate {kind} registration: {key}"
        reg[key] = obj
        return obj
    return deco


def register_vfe(name=None):
    return _register("vfe", name)


def register_middle(name=None):
    return _register("middle", name)


def register_odom(name=None):
    return _register("odom", name)


def register_net(name=None):
    return _register("net", name)


def register_dataset(name=None):
    return _register("dataset", name)


def get(kind: str, name: str):
    reg = _REGISTRIES[kind]
    if name not in reg:
        raise KeyError(f"unknown {kind} '{name}'; have {sorted(reg)}")
    return reg[name]
