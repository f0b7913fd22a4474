"""Parameter-tree surgery: regex include/exclude filtering, key renaming,
partial pretrained loading and freezing.

The analog of the reference's param tools
(/root/reference/rslo/utils/util.py:42-102 filter_param_dict /
modify_parameter_name_with_map and train_hdf5.py:108-142
freeze_params_v2), operating on flax nested param dicts addressed by
"/"-joined paths.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax


def flatten(params: Any) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = leaf
    return flat


def unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, leaf in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return out


def filter_params(params: Any, include: str | None = None,
                  exclude: str | None = None) -> Dict[str, Any]:
    """Keep leaves whose path matches ``include`` (if set) and does not
    match ``exclude`` (if set)."""
    flat = flatten(params)
    out = {}
    for k, v in flat.items():
        if include is not None and re.search(include, k) is None:
            continue
        if exclude is not None and re.search(exclude, k) is not None:
            continue
        out[k] = v
    return out


def rename_params(params: Any, rename_map: Dict[str, str]) -> Any:
    """Apply regex substitutions to every path (first match wins)."""
    flat = flatten(params)
    out = {}
    for k, v in flat.items():
        nk = k
        for pat, rep in rename_map.items():
            nk2 = re.sub(pat, rep, nk)
            if nk2 != nk:
                nk = nk2
                break
        out[nk] = v
    return unflatten(out)


def load_pretrained(params: Any, pretrained: Any,
                    include: str | None = None,
                    exclude: str | None = None,
                    rename_map: Dict[str, str] | None = None,
                    strict_shapes: bool = True) -> Any:
    """Copy matching pretrained leaves into ``params``; returns the
    merged tree and the list of loaded keys."""
    if rename_map:
        pretrained = rename_params(pretrained, rename_map)
    src = filter_params(pretrained, include, exclude)
    dst = flatten(params)
    loaded = []
    for k, v in src.items():
        if k in dst:
            if dst[k].shape != v.shape:
                if strict_shapes:
                    raise ValueError(
                        f"shape mismatch at {k}: {dst[k].shape} vs "
                        f"{v.shape}")
                continue
            dst[k] = v
            loaded.append(k)
    return unflatten(dst), loaded


def freeze_mask(params: Any, frozen_pattern: str) -> Any:
    """Boolean pytree: True where the path matches (for
    optax.masked / multi_transform freezing)."""
    flat = flatten(params)
    return unflatten({k: bool(re.search(frozen_pattern, k))
                      for k in flat})
