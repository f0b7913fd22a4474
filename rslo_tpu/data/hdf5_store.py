"""HDF5 dataset store: offline KITTI -> all.h5 conversion + readers.

Replicates the reference's offline data build
(/root/reference/script/create_hdf5.py:166-377): per sequence, vlen
datasets ``lidar_points`` (Nx4 flattened), ``lidar_normals`` (Nx3),
``hier_lidar_points_normals_{size}`` (Nx6), plus ``poses`` (Nx12) and
``calib_Tr`` (Nx12).  Normals come from kNN-PCA (see
:mod:`rslo_tpu.data.normals`) instead of open3d; hierarchical clouds are
voxel-grid means at the configured sizes (default 0.1 like the deployed
config).

One process-wide reader handle per file (SWMR), mirroring the
reference's HDF5 singleton (rslo/utils/singleton.py:18-58).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_HANDLES: dict = {}


def get_h5(path: str):
    import h5py
    key = (os.getpid(), str(path))
    if key not in _HANDLES:
        _HANDLES[key] = h5py.File(path, "r", libver="latest", swmr=True,
                                  rdcc_nbytes=1024 ** 3, rdcc_nslots=100003)
    return _HANDLES[key]


def create_hdf5(kitti_root: str, out_path: str,
                sequences: Sequence[int] = tuple(range(11)),
                downsample_sizes: Sequence[float] = (0.1,),
                normal_radius: float = 0.6, normal_k: int = 30,
                cross_normal_radius: float | None = None,
                max_frames: int | None = None,
                progress: bool = True) -> None:
    """Build the training store from a raw KITTI odometry tree."""
    import h5py
    from .kitti_io import (list_frames, read_calib, read_poses,
                           read_velodyne, sequence_paths)
    from .normals import estimate_normals, voxel_downsample

    with h5py.File(out_path, "w", libver="latest") as f:
        for seq in sequences:
            velo_dir, seq_dir, pose_file = sequence_paths(kitti_root, seq)
            frames = list_frames(velo_dir)
            if max_frames:
                frames = frames[:max_frames]
            calib = read_calib(seq_dir)
            Tr = calib["Tr"].reshape(-1)
            poses = (read_poses(pose_file)[:len(frames)]
                     if pose_file is not None else
                     np.tile(np.eye(3, 4).reshape(1, 3, 4),
                             (len(frames), 1, 1)))
            g = f.create_group(f"{seq:02d}")
            n = len(frames)
            vf = h5py.vlen_dtype(np.float32)
            d_pts = g.create_dataset("lidar_points", (n,), dtype=vf)
            d_nrm = g.create_dataset("lidar_normals", (n,), dtype=vf)
            d_cross = (g.create_dataset("lidar_cross_normals", (n,),
                                        dtype=vf)
                       if cross_normal_radius else None)
            d_hier = {s: g.create_dataset(
                f"hier_lidar_points_normals_{s}", (n,), dtype=vf)
                for s in downsample_sizes}
            g.create_dataset("poses", data=poses.reshape(n, 12))
            g.create_dataset("calib_Tr", data=np.tile(Tr, (n, 1)))
            for i, fr in enumerate(frames):
                pts = read_velodyne(fr)
                normals = estimate_normals(pts[:, :3], normal_radius,
                                           normal_k)
                d_pts[i] = pts.reshape(-1)
                d_nrm[i] = normals.reshape(-1)
                if d_cross is not None:
                    # larger-scale normals as the network-input variant
                    # (the reference's cross-frame normals use temporal
                    # aggregation; this uses a coarser spatial scale)
                    d_cross[i] = estimate_normals(
                        pts[:, :3], cross_normal_radius,
                        normal_k).reshape(-1)
                pn = np.concatenate([pts[:, :3], normals], axis=1)
                for s in downsample_sizes:
                    d_hier[s][i] = voxel_downsample(pn, s).reshape(-1)
                if progress and i % 100 == 0:
                    print(f"seq {seq:02d}: {i}/{n}", flush=True)


class SequenceReader:
    """Random access to one sequence's frames in an all.h5 store."""

    def __init__(self, h5_path: str, seq: int):
        self.path = h5_path
        self.seq = seq
        g = get_h5(h5_path)[f"{seq:02d}"]
        self.n_frames = len(g["lidar_points"])

    def frame(self, i: int, cross_normals: bool = False) -> dict:
        g = get_h5(self.path)[f"{self.seq:02d}"]
        pts = g["lidar_points"][i].reshape(-1, 4)
        nrm = g["lidar_normals"][i].reshape(-1, 3)
        if cross_normals and "lidar_cross_normals" in g:
            # network input = cross normals; fine normals appended as
            # supervision (10-col points, crossnorm dataset semantics,
            # kitti_dataset_crossnorm_hdf5.py:257-273)
            cross = g["lidar_cross_normals"][i].reshape(-1, 3)
            points = np.concatenate([pts, cross, nrm], axis=1)
        else:
            points = np.concatenate([pts, nrm], axis=1)  # (N, 7)
        out = {
            "points": points,
            "pose": g["poses"][i].reshape(3, 4),
            "Tr": g["calib_Tr"][i].reshape(3, 4),
        }
        for k in g:
            if k.startswith("hier_"):
                out[k] = g[k][i].reshape(-1, 6)
        return out
