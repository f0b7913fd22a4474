"""Sharded windowed pose-graph refinement over the device mesh.

Stage 1 of the north-star distributed BA layer (BASELINE.json): the
trajectory is cut into fixed-size overlapping windows; every window is
the SAME static Gauss-Newton problem, so the whole batch is one
``vmap``-ped jitted solve sharded over the mesh "data" axis — each chip
refines its share of the map concurrently, then the host stitches the
overlaps (anchor-aligned composition).  Keyframe windows are the "map
blocks"; a Schur-complement landmark elimination slots into the same
structure once voxel landmarks join the graph (later round).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import (np_compose_pose, np_invert_pose, odom_to_abs_pose)
from .pose_graph import PoseGraph, optimize_pose_graph


def _batched_solver(window: int, max_edges: int, iters: int):
    """Jitted vmapped GN solve for (W, window, 7) pose batches."""

    def solve_one(poses0, edges, meas, info):
        anchors = jnp.zeros((window,), bool).at[0].set(True)
        graph = PoseGraph(edges, meas, info, anchors)
        opt, cost = optimize_pose_graph(poses0, graph, iters=iters)
        return opt, cost

    return jax.jit(jax.vmap(solve_one))


def fuse_windows_sharded(pair_edges: np.ndarray, pair_motions: np.ndarray,
                         n_poses: int,
                         pair_weights: np.ndarray | None = None,
                         window: int = 64, overlap: int = 16,
                         iters: int = 8, mesh=None) -> np.ndarray:
    """Parallel-window variant of
    :func:`rslo_tpu.pgo.refine.fuse_window_odometry`.

    All windows solve concurrently from the chained initialization (one
    device batch), then overlaps stitch left-to-right on the host.  With
    a mesh, the window batch is sharded across devices.
    """
    pair_edges = np.asarray(pair_edges)
    pair_motions = np.asarray(pair_motions, np.float32)
    if pair_weights is None:
        pair_weights = np.ones(len(pair_edges), np.float32)

    chain = {tuple(e): k for k, e in enumerate(pair_edges)}
    odoms = np.zeros((n_poses, 7), np.float32)
    odoms[:, 3] = 1.0
    for i in range(n_poses - 1):
        k = chain.get((i, i + 1))
        if k is not None:
            odoms[i + 1] = pair_motions[k]
    abs_poses = odom_to_abs_pose(odoms)

    step = window - overlap
    starts = list(range(0, max(n_poses - overlap - 1, 1), step))
    # group edges per window, pad to a common static capacity
    per_win = []
    for s in starts:
        e = min(s + window, n_poses)
        sel = [(k, ed) for k, ed in enumerate(pair_edges)
               if s <= ed[0] and ed[1] < e]
        per_win.append((s, e, sel))
    max_edges = max((len(sel) for _, _, sel in per_win), default=1)
    W = len(per_win)

    P0 = np.zeros((W, window, 7), np.float32)
    P0[:, :, 3] = 1.0
    E = np.zeros((W, max_edges, 2), np.int32)
    M = np.zeros((W, max_edges, 7), np.float32)
    M[:, :, 3] = 1.0
    I = np.zeros((W, max_edges, 6, 6), np.float32)
    for w, (s, e, sel) in enumerate(per_win):
        base_inv = np_invert_pose(abs_poses[s])
        for i in range(e - s):
            P0[w, i] = np_compose_pose(base_inv[None],
                                       abs_poses[s + i][None])[0]
        for i in range(e - s, window):
            P0[w, i] = P0[w, e - s - 1]  # park padding at last pose
        for j, (k, ed) in enumerate(sel):
            E[w, j] = ed - s
            M[w, j] = pair_motions[k]
            I[w, j] = np.eye(6) * pair_weights[k]

    solver = _batched_solver(window, max_edges, iters)
    args = (jnp.asarray(P0), jnp.asarray(E), jnp.asarray(M),
            jnp.asarray(I))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # pad W to a multiple of the mesh size for even sharding
        D = mesh.devices.size
        padW = (-W) % D
        if padW:
            args = tuple(jnp.concatenate(
                [a, jnp.repeat(a[-1:], padW, axis=0)]) for a in args)
        sh = NamedSharding(mesh, P("data"))
        args = tuple(jax.device_put(a, sh) for a in args)
    opt, _cost = solver(*args)
    opt = np.asarray(opt)[:W]

    # stitch: compose each window's local solution onto the refined
    # trajectory so far (left to right)
    refined = abs_poses.copy()
    for w, (s, e, sel) in enumerate(per_win):
        base = refined[s]
        for i in range(e - s):
            refined[s + i] = np_compose_pose(base[None], opt[w, i][None])[0]
    return refined
